"""Who moves 0.23/step in the 'settled' 500k bench tissue?

The staleness certificate measures a persistent ~0.22 single-step gap
closure (diag_rebin).  This prints the top displacement cells per step
(id, type, radius, morphogens, nearest-neighbour distance) to tell
physics (rim epithelium under bending/migration) from pathology
(IC artifact or a dt-limit-cycle pair straddling the relu kink).
Usage: python benchmarks/diag_fastcells.py [n] [steps]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from yalla_tpu.dtypes import Float3  # noqa: E402
from yalla_tpu.models import branching as B  # noqa: E402
from yalla_tpu.ops.common import friction_w_neighbour  # noqa: E402
from yalla_tpu.ops.lattice_xla import (lattice_grid_for,  # noqa: E402
                                       lattice_heun_steps)
from yalla_tpu.polarity import polarity_precompute  # noqa: E402
from yalla_tpu.inits import relu_force  # noqa: E402

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

n_pad = -(-n_cells // 4096) * 4096
X = bench._ic(n_cells, n_pad, 0)
old_v = Float3.zeros(n_pad)
p = B.Params()
force = B.make_force(p)
n = jnp.int32(n_cells)
pallas = jax.default_backend() == "tpu"

_, extent0 = bench._max_occ(X, n_cells, 64, p.r_max)
gs0 = lattice_grid_for(extent0 * 1.04 + 1.0, p.r_max, 8)
for pw, pre in ((relu_force, None), (force, polarity_precompute)):
    X, old_v, aux = lattice_heun_steps(
        bench.RELAX_STEPS, bench.REBUILD_EVERY, pw, friction_w_neighbour,
        "com", gs0, 8, 2, X, old_v, n, jnp.float32(p.dt),
        jnp.float32(p.r_max), jnp.int32(0), pre, pallas)

act = np.arange(n_pad) < n_cells
prev = np.stack([np.asarray(X.x), np.asarray(X.y), np.asarray(X.z)], 1)
rmax_prev = None
for k in range(n_steps):
    X, old_v, aux = lattice_heun_steps(
        1, 1, force, friction_w_neighbour, "com", gs0, 8, 2,
        X, old_v, n, jnp.float32(p.dt), jnp.float32(p.r_max),
        jnp.int32(0), polarity_precompute, pallas)
    cur = np.stack([np.asarray(X.x), np.asarray(X.y), np.asarray(X.z)], 1)
    d = np.linalg.norm(cur - prev, axis=1)
    d[~act] = 0
    top = np.argsort(d)[::-1][:8]
    rr = np.linalg.norm(cur, axis=1)
    ct = np.asarray(X.ctype)
    u, v = np.asarray(X.u), np.asarray(X.v)
    print(f"step {k}: max_disp={d[top[0]]:.3f} "
          f"p99.99={np.percentile(d[act], 99.99):.3f} "
          f"p99={np.percentile(d[act], 99):.3f} "
          f"median={np.median(d[act]):.4f}")
    for i in top[:5]:
        # nearest active neighbour
        box = (np.abs(cur[act] - cur[i]) < 2.0).all(1)
        cand = cur[act][box]
        dd = np.linalg.norm(cand - cur[i], axis=1)
        dd = dd[dd > 0]
        nn = dd.min() if len(dd) else np.inf
        print(f"  cell {i}: disp={d[i]:.3f} r={rr[i]:.1f} "
              f"ctype={ct[i]:.0f} u={u[i]:.2f} v={v[i]:.2f} "
              f"nn={nn:.3f}")
    prev = cur
