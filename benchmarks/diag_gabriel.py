"""TPU sweep: windowed-Gabriel (i_block, window_cap, NC) configs at the
reference growth_w_wall scale, plus isolated sub-phase timings."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from yalla_tpu.dtypes import Float3
from yalla_tpu.ops.common import friction_w_neighbour
from yalla_tpu.ops.grid_xla import gabriel_windowed

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
n_pad = -(-n_cells // 4096) * 4096
rng = np.random.default_rng(0)
side = int(np.ceil((2 * n_cells) ** (1 / 3)))
g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
             -1).reshape(-1, 3)
pos = (g - side / 2) * 0.75 + rng.uniform(-0.2, 0.2, (len(g), 3))
pos = pos[pos[:, 2] > 0.2][:n_pad - 1].astype(np.float32)
P = np.zeros((n_pad, 3), np.float32)
P[1:1 + len(pos)] = pos
X = Float3(x=jnp.asarray(P[:, 0]), y=jnp.asarray(P[:, 1]),
           z=jnp.asarray(P[:, 2]))
ov = Float3.zeros(n_pad)
n = jnp.int32(min(n_cells, len(pos) + 1))
r_max = 1.0


def spring(Xi, r, dist, i, j):
    F = jnp.where((i != j) & (dist < r_max),
                  jnp.fmax(0.8 - dist, 0.0) * 2 - jnp.fmax(dist - 0.8, 0.0),
                  0.0)
    pre = jnp.where(dist > 1e-12, F / jnp.maximum(dist, 1e-12), 0.0)
    return Float3(x=pre * r.x, y=pre * r.y, z=pre * r.z), {}


def timeit(name, fn, reps=3):
    out = fn()
    jax.tree.map(lambda a: a.block_until_ready(), out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.tree.map(lambda a: a.block_until_ready(), out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{name}: {ms:.0f} ms ({int(n) / ms * 1000:.3g} c-s/s)",
          flush=True)
    return out


for ib, wc, nc, sub in [(1024, 64, 32, 16), (2048, 64, 32, 16),
                        (4096, 64, 32, 16), (2048, 64, 24, 16),
                        (2048, 48, 24, 8), (2048, 64, 20, 16),
                        (4096, 64, 24, 16), (2048, 96, 24, 32)]:
    fn = jax.jit(lambda ib=ib, wc=wc, nc=nc, sub=sub: gabriel_windowed(
        spring, friction_w_neighbour, X, ov, n, jnp.float32(r_max),
        grid_size=64, i_block=ib, window_cap=wc, max_candidates=nc,
        row_cap=24, salvage_cap=512, subgroup=sub))
    out = timeit(f"ib={ib} wc={wc} nc={nc} sub={sub}", fn)
    aux = out[3]
    flags = {k: float(jnp.max(v)) for k, v in aux.items()
             if k.startswith("__err")}
    print(f"   flags: {flags}", flush=True)
