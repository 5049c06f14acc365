"""Per-chunk staleness-closure diagnostic at the 500k bench state.

The bench's first probe (rebuild_every=4, cube 1.1) measures a shear
closure of ~0.29 per 4-step chunk -- far above the 0.1 binning margin.
This prints the closure/displacement of each successive 4-step chunk
separately (the bench only sees the max over a 20-step run) to show
whether it is a settling transient or steady-state physics, at two cube
sizes.  Usage: python benchmarks/diag_stale2.py [n] [chunks]
"""
import sys
import time

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
n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 10

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
print(f"relaxed (2 x {bench.RELAX_STEPS} steps); dt={p.dt}",
      file=sys.stderr)

for cube_m in (1.1, 1.2):
    cube = jnp.float32(p.r_max * cube_m)
    occ, _ = bench._max_occ(X, n_cells, 64, float(cube))
    C = max(8, occ + 1)
    while (64 * C) % 128:
        C += 1
    Xc, ovc = X, old_v
    print(f"cube x{cube_m}: max_occ={occ} C={C}; per-4-step-chunk "
          f"(closure, max_disp):", file=sys.stderr)
    vals = []
    for k in range(n_chunks):
        Xc, ovc, aux = lattice_heun_steps(
            4, 4, force, friction_w_neighbour, "com", 64, C, 2,
            Xc, ovc, n, jnp.float32(p.dt), cube, jnp.int32(0),
            polarity_precompute, pallas, None, None,
            jnp.float32(p.r_max))
        cl = float(aux["stale_shear_closure"])
        dp = float(aux["stale_max_disp"])
        dropped = int(aux["__err_lattice_dropped"])
        vals.append((cl, dp, dropped))
        print(f"  chunk {k}: closure={cl:.3f} disp={dp:.3f} "
              f"dropped={dropped}", file=sys.stderr)
    print(f"cube x{cube_m}: closures "
          f"{[round(v[0], 3) for v in vals]}")
