"""Micro-tests for the rebuild primitives: packed scatters, monotone
gathers, payload-width sort scaling, histogram-based cube starts."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n_pad = 503808  # 123 * 4096
gs, C = 64, 8
n_slots = gs ** 3 * C

rng = np.random.default_rng(0)
slot_np = np.sort(rng.choice(n_slots, n_pad, replace=False)).astype(np.int32)
slot_sorted = jnp.asarray(slot_np)
perm = jnp.asarray(rng.permutation(n_pad).astype(np.int32))
vals = [jnp.asarray(rng.random(n_pad), jnp.float32) for _ in range(12)]


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    print(f"{name}: {(time.perf_counter() - t0) / reps * 1000:.1f} ms",
          flush=True)
    return out


@jax.jit
def scat12(slot, vs):
    return [jnp.zeros(n_slots, jnp.float32).at[slot].set(
        v, mode="drop", unique_indices=True) for v in vs]


timeit("scatter 12 f32", scat12, slot_sorted, tuple(vals))


@jax.jit
def scat6_c64(slot, vs):
    outs = []
    for a in range(0, 12, 2):
        c = jax.lax.complex(vs[a], vs[a + 1])
        o = jnp.zeros(n_slots, jnp.complex64).at[slot].set(
            c, mode="drop", unique_indices=True)
        outs.append(o)
    return [f(o) for o in outs for f in (jnp.real, jnp.imag)]


o1 = timeit("scatter 6 complex64", scat6_c64, slot_sorted, tuple(vals))
o0 = scat12(slot_sorted, tuple(vals))
print("complex pack exact:",
      all(bool(jnp.array_equal(a, b)) for a, b in zip(o0, o1)), flush=True)


@jax.jit
def gath12_rand(perm, vs):
    return [v[perm] for v in vs]


@jax.jit
def gath12_mono(slot, vs):
    pick = jnp.minimum(slot[:n_pad], n_pad - 1)
    return [v[pick] for v in vs]


timeit("gather 12 f32 random idx", gath12_rand, perm, tuple(vals))
timeit("gather 12 f32 monotone idx", gath12_mono,
       jnp.asarray(np.sort(rng.choice(n_pad, n_pad)).astype(np.int32)),
       tuple(vals))


@jax.jit
def gath6_c64(perm, vs):
    outs = []
    for a in range(0, 12, 2):
        c = jax.lax.complex(vs[a], vs[a + 1])
        outs.append(c[perm])
    return [f(o) for o in outs for f in (jnp.real, jnp.imag)]


timeit("gather 6 complex64 random idx", gath6_c64, perm, tuple(vals))

cid = jnp.asarray((slot_np // C).astype(np.int32))
iota = jnp.arange(n_pad, dtype=jnp.int32)


def sortn(k):
    @jax.jit
    def f(cid, vs):
        return jax.lax.sort((cid, iota) + vs[:k], num_keys=2)
    return f


for k in (0, 4, 8, 11):
    timeit(f"sort 2+{k} payloads", sortn(k), cid, tuple(vals))


@jax.jit
def sort_packed(cid, vs):
    packed = tuple(jax.lax.complex(vs[a], vs[a + 1]) for a in range(0, 10, 2))
    return jax.lax.sort((cid, iota) + packed, num_keys=2)


timeit("sort 2+5 complex payloads (=10 f32)", sort_packed, cid, tuple(vals))


@jax.jit
def cube_starts_hist(cid):
    cnt = jnp.zeros(gs ** 3, jnp.int32).at[cid].add(1, mode="drop")
    return jnp.cumsum(cnt) - cnt


timeit("cube starts: histogram scatter-add + cumsum", cube_starts_hist, cid)


@jax.jit
def cube_starts_ss(cid):
    return jnp.searchsorted(cid, jnp.arange(gs ** 3, dtype=jnp.int32))


timeit("cube starts: searchsorted", cube_starts_ss, cid)
