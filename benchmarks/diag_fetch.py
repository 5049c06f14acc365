"""Micro-bench: window-fetch strategies for sorted-order candidates.
A: vmapped dynamic_slice, arbitrary starts  (the current gabriel path)
B: take of 128-aligned rows from [K, S, 128] (row-gather)
C: take of 64-aligned rows from [K, S, 64]
D: one-hot MXU extraction of tight windows from block superwindows
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

n_pad, K = 102400, 13
rng = np.random.default_rng(0)
srt = jnp.asarray(rng.normal(size=(K, n_pad)).astype(np.float32))
N_WIN, Wr = 57600, 64          # 800 blocks x 8 subgroups x 9 rows
starts = jnp.asarray(rng.integers(0, n_pad - 3 * 128, N_WIN), jnp.int32)

def timeit(name, fn, reps=5):
    out = jax.jit(fn)(); out.block_until_ready()
    _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.jit(fn)()
    _ = float(np.asarray(out).ravel()[0])
    print(f"{name}: {(time.perf_counter()-t0)/reps*1000:.1f} ms", flush=True)

def A():
    win = jax.vmap(lambda s: jax.lax.dynamic_slice(srt, (0, s), (K, Wr)))(starts)
    return jnp.sum(win)

def B():
    s3 = srt.reshape(K, n_pad // 128, 128)
    idx = starts // 128
    idx2 = jnp.stack([idx, idx + 1], -1).reshape(-1)      # 2 segs each
    win = jnp.take(s3, idx2, axis=1)                      # [K, 2N, 128]
    return jnp.sum(win)

def C():
    s3 = srt.reshape(K, n_pad // 64, 64)
    idx = starts // 64
    idx2 = jnp.stack([idx, idx + 1], -1).reshape(-1)
    win = jnp.take(s3, idx2, axis=1)
    return jnp.sum(win)

def D():
    # 800 block superwindows [K, 512] (aligned static-ish fetch) then
    # one-hot matmul extracts 72 tight windows of 64 from each
    nb, SW, nw = 800, 512, 72
    bstart = (jnp.arange(nb) * (n_pad // nb)).astype(jnp.int32)
    sw = jax.vmap(lambda s: jax.lax.dynamic_slice(srt, (0, s), (K, SW)))(bstart)
    offs = jnp.asarray(rng.integers(0, SW - Wr, (nb, nw)), jnp.int32)
    p = jnp.arange(SW, dtype=jnp.int32)[None, :, None, None]
    onehot = ((p >= offs[:, None, :, None])
              & (p < offs[:, None, :, None] + Wr)
              & ((p - offs[:, None, :, None])
                 == jnp.arange(Wr, dtype=jnp.int32)[None, None, None, :]))
    win = jnp.einsum("bks,bswr->bkwr", sw, onehot.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return jnp.sum(win)

timeit("A vmapped dyn_slice arb", A)
timeit("B take 128-rows x2", B)
timeit("C take 64-rows x2", C)
timeit("D superwindow + MXU onehot", D)
