"""Who drives the staleness closure at 500k?

From the bench's settled state, measures (a) the build-state closure
with overflow extras live (certificate sanity: must be ~<= 0), and
(b) the per-step displacement distribution (max / quantiles / counts
above the cube margin) -- if a handful of rattler contacts move
~0.25/step while the bulk moves ~0.01, the resident cadence is dead for
honest reasons and the pass/rebuild costs are the only levers; if the
bulk itself moves past the margin, settling is incomplete.

Usage: python benchmarks/diag_disp500k.py [n_cells]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402
from yalla_tpu.ops.common import friction_w_neighbour  # noqa: E402
from yalla_tpu.ops.lattice_xla import lattice_heun_steps  # noqa: E402
from yalla_tpu.polarity import polarity_precompute  # noqa: E402

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000

X, old_v, p, force, n, pallas = bench._prepare_branching(n_cells)
best = bench._plan_lattice(X, n_cells, p.r_max, (1.1,), pallas, 2, 16)
_, m, gs, C, max_occ, extent, n_e, e_b = best
cube = p.r_max * m
extras_cap = bench.E_CAP if e_b else 0
print(f"# plan: gs={gs} C={C} extras={n_e} (block cap {e_b})", flush=True)


def steps(k, dt, rebuild):
    return lattice_heun_steps(
        k, rebuild, force, friction_w_neighbour, "com", gs, C, 2, X,
        old_v, n, jnp.float32(dt), jnp.float32(cube), jnp.int32(0),
        polarity_precompute, pallas, None, None, jnp.float32(p.r_max),
        extras_cap, max(e_b, 8), 0, False)


# (a) build-state certificate with extras live: dt=0, one 4-step chunk
out = steps(4, 0.0, 4)
aux = out[2]
print(f"dt=0 closure={float(aux['stale_shear_closure']):.4f} "
      f"stale={float(aux['__err_stale'])} "
      f"disp={float(aux['stale_max_disp']):.4f}", flush=True)

# (b) displacement distribution over one real step (chunk of 1)
out1 = steps(1, p.dt, 1)
aux1 = out1[2]
d = np.zeros(X.x.shape[0], np.float64)
for f in ("x", "y", "z"):
    d = np.maximum(d, np.abs(np.asarray(getattr(out1[0], f), np.float64)
                             - np.asarray(getattr(X, f), np.float64)))
d = d[:n_cells]
qs = np.quantile(d, [0.5, 0.99, 0.999, 0.9999, 1.0])
margin = cube - p.r_max
print(f"one-step |dX|: median={qs[0]:.4f} p99={qs[1]:.4f} "
      f"p99.9={qs[2]:.4f} p99.99={qs[3]:.4f} max={qs[4]:.4f}", flush=True)
print(f"cells with 2|dX| > margin({margin:.2f}): "
      f"{int(np.sum(2 * d > margin))} "
      f"(> margin/2: {int(np.sum(4 * d > margin))})", flush=True)

# (c) 4-step chunk at the bench cadence for the headline closure
out4 = steps(4, p.dt, 4)
aux4 = out4[2]
print(f"chunk-4 closure={float(aux4['stale_shear_closure']):.4f} "
      f"stale={float(aux4['__err_stale'])} "
      f"disp={float(aux4['stale_max_disp']):.4f}", flush=True)
