"""Ablate the 500k lattice-kernel pass: body vs channels vs floor.

Times `lattice_heun_steps` at the bench's own settled 500k state and
capacity plan under forces of graded cost, all on the same kernel
(ops/lattice_pallas.py):

  full   -- the flagship branching force + polarity precompute (the
            bench headline: heavy body, K_j ~ 12 channels, M ~ 12 accums)
  relu   -- the plain relu band (cheap body, K_j = 6, M = 7)
  minK   -- trivial body that READS the same wide field set as `full`
            (isolates DMA + roll + r-subtraction channel scaling)
  min1   -- trivial body reading only x,y,z with one output channel
            (the structural floor: DMA + rolls + dist + 1 accumulate)
  min1nf -- min1 with friction pruned too (floor without sum_f/sum_v)

The deltas between rungs locate where the ~N ms/pass actually goes --
force body (full-relu), channel machinery (minK-min1), or structure
(min1nf) -- and therefore which lever (body algebra, channel pruning,
roll elimination) is worth the next kernel rewrite.

Usage: python benchmarks/diag_ablate500k.py [n_cells] [n_steps]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402
from yalla_tpu.inits import relu_force  # noqa: E402
from yalla_tpu.ops.common import friction_w_neighbour  # noqa: E402
from yalla_tpu.ops.lattice_xla import lattice_heun_steps  # noqa: E402
from yalla_tpu.polarity import polarity_precompute  # noqa: E402

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16

X, old_v, p, force, n, pallas = bench._prepare_branching(n_cells)
best = bench._plan_lattice(X, n_cells, p.r_max, (1.1, 1.2, 1.3), pallas,
                           2, 16)
_, m, gs, C, max_occ, extent, n_e, e_b = best
cube = p.r_max * m
extras_cap = bench.E_CAP if e_b else 0
print(f"# plan: gs={gs} C={C} max_occ={max_occ} cube=x{m} "
      f"extras={n_e} (block cap {e_b})", flush=True)


from yalla_tpu.models import branching as B  # noqa: E402


def trivial_wide(Xi, r, dist, i, j):
    # reads the same j-side field set as the branching force (x,y,z via
    # dist; u, v, ctype, and the polarity vector) with a ~free body
    w = (dist < 1.0).astype(jnp.float32)
    s = r.u + r.v + r.ctype + r.px + r.py + r.pz
    zero = jnp.zeros_like(dist)
    return B.Cell(x=w * (r.x + 1e-30 * s), y=w * r.y, z=w * r.z,
                  theta=zero, phi=zero, u=zero, v=zero, ctype=zero)


def trivial_min(Xi, r, dist, i, j):
    w = (dist < 1.0).astype(jnp.float32)
    zero = jnp.zeros_like(dist)
    return B.Cell(x=w * r.x, y=zero, z=zero, theta=zero, phi=zero,
                  u=zero, v=zero, ctype=zero)


def fr_zero(Xi, r, dist, i, j):
    return jnp.zeros_like(dist)


CASES = [
    ("full", force, friction_w_neighbour, polarity_precompute),
    ("relu", relu_force, friction_w_neighbour, None),
    ("minK", trivial_wide, friction_w_neighbour, polarity_precompute),
    ("min1", trivial_min, friction_w_neighbour, None),
    ("min1nf", trivial_min, fr_zero, None),
]

for name, pw, fr, pre in CASES:
    def run():
        return lattice_heun_steps(
            n_steps, 4, pw, fr, "com", gs, C, 2, X, old_v, n,
            jnp.float32(p.dt), jnp.float32(cube), jnp.int32(0), pre,
            pallas, None, None, jnp.float32(p.r_max), extras_cap,
            max(e_b, 8), 0, False)

    out = run()
    _ = float(np.asarray(out[0].x)[0])      # tunnel sync
    t0 = time.perf_counter()
    out = run()
    _ = float(np.asarray(out[0].x)[0])
    dt = time.perf_counter() - t0
    flags = {k: float(v) for k, v in out[2].items()
             if k.startswith("__err_") and float(v)}
    print(f"{name}: {dt / n_steps * 1000:.2f} ms/step "
          f"({n_cells * n_steps / dt:.4g} c-s/s) flags={flags}",
          flush=True)
