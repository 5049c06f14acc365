"""Time lattice_rebin vs lattice_build + lattice_unbuild at 500k.

The reference-exact cadence rebuilds the binning per pairwise pass
(solvers.cuh:494); with the staleness certificate rejecting resident
cadences at the bench's physics (per-step closure ~0.215 vs the 0.1
margin at cube 1.1), the rebuild cost IS the gap between the honest
number (~2.3e6) and the round-2 resident one (4.6e6).  This isolates
the candidate replacement: slot-space rebinning (movers only) instead
of the global sort + pour + unbuild round trip.

Usage: python benchmarks/diag_rebin_cost.py [n] [C] [m_cap]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from yalla_tpu.dtypes import Float3  # noqa: E402
from yalla_tpu.models import branching as B  # noqa: E402
from yalla_tpu.ops.lattice_xla import (lattice_build, lattice_rebin,  # noqa: E402
                                       lattice_unbuild)

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
C = int(sys.argv[2]) if len(sys.argv) > 2 else 8
m_cap = int(sys.argv[3]) if len(sys.argv) > 3 else 65536
gs, cube = 64, 1.1
n_pad = -(-n_cells // 4096) * 4096

rng = np.random.default_rng(0)
side = int(np.ceil((n_cells * 6 / np.pi) ** (1 / 3))) + 2
g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
             -1).reshape(-1, 3)
pos = (g - side / 2) * 0.75 + rng.uniform(-0.2, 0.2, (len(g), 3))
pos = pos[np.argsort(np.linalg.norm(pos, axis=1))][:n_pad]
pos[n_cells:] = 0.0
X = B.Cell(x=jnp.asarray(pos[:, 0], jnp.float32),
           y=jnp.asarray(pos[:, 1], jnp.float32),
           z=jnp.asarray(pos[:, 2], jnp.float32),
           theta=jnp.asarray(rng.random(n_pad), jnp.float32),
           phi=jnp.asarray(rng.random(n_pad), jnp.float32),
           u=jnp.asarray(rng.random(n_pad), jnp.float32),
           v=jnp.asarray(rng.random(n_pad), jnp.float32),
           ctype=jnp.zeros(n_pad, jnp.float32))
ov = Float3.zeros(n_pad)
n = jnp.int32(n_cells)


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name}: {dt:.1f} ms", flush=True)
    return out


build = jax.jit(lambda X, ov: lattice_build(X, ov, n, cube, gs, C, 2048,
                                            pallas_pour=True))
lay = timeit("lattice_build (pour kernel, extras)", build, X, ov)


# rebin after a realistic perturbation: ~3% of cells cross a cube face
# per step at the bench's step sizes (movers scale with displacement)
@jax.jit
def perturb(lay, key):
    ks = jax.random.split(key, 3)
    T = lay.T.replace(
        x=lay.T.x + 0.03 * jax.random.normal(ks[0], lay.T.x.shape),
        y=lay.T.y + 0.03 * jax.random.normal(ks[1], lay.T.y.shape),
        z=lay.T.z + 0.03 * jax.random.normal(ks[2], lay.T.z.shape))
    return lay._replace(T=T)


lay_p = perturb(lay, jax.random.PRNGKey(0))
reb = jax.jit(lambda lay: lattice_rebin(lay, cube, gs, C, m_cap, 2048))
out = timeit("lattice_rebin (perturbed, extras)", reb, lay_p)
print(f"  movers handled, n_unrebinned={int(out[1])} "
      f"n_dropped={int(out[0].n_dropped)} "
      f"n_extras={int(out[0].n_extras)}", flush=True)

unbuild = jax.jit(lattice_unbuild)
timeit("lattice_unbuild", unbuild, lay, X, ov)
