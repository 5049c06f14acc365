"""A/B: slot-plane kernel vs flat Pallas kernel at 500k bench shapes.

Times fused 8-step runs (rebuild_every given) of the branching force via
lattice_heun_steps with the planes dispatch toggled through
lattice_planes.planes_supported monkeypatching.
Usage: python benchmarks/diag_planes.py [n] [C] [cube_mult] [rebuild]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench
from yalla_tpu.dtypes import Float3
from yalla_tpu.models import branching as B
from yalla_tpu.ops.common import friction_w_neighbour
from yalla_tpu.ops.lattice_xla import lattice_heun_steps, lattice_grid_for
from yalla_tpu.polarity import polarity_precompute
from yalla_tpu.inits import relu_force
import yalla_tpu.ops.lattice_pallas as LP

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
C = int(sys.argv[2]) if len(sys.argv) > 2 else 8
cm = float(sys.argv[3]) if len(sys.argv) > 3 else 1.1
rebuild = int(sys.argv[4]) if len(sys.argv) > 4 else 1

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
        96, 4, pw, friction_w_neighbour, "com", gs0, 16, 2, X, old_v, n,
        jnp.float32(p.dt), jnp.float32(p.r_max), jnp.int32(0), pre, pallas)
    assert int(aux["__err_out_of_grid"]) == 0

cube = p.r_max * cm
gs = (64, 64, 64)
occ, _ = bench._max_occ(X, n_cells, 64, cube)
n_e, e_blk = bench._extras_plan(X, n_cells, gs, cube, C)
e_b = -(-max(e_blk * 2, e_blk + 6) // 8) * 8 if occ > C else 0
ecap = 2048 if e_b else 0
print(f"# occ={occ} C={C} cube={cube} extras={n_e} e_b={e_b}", flush=True)

def run(n_steps):
    return lattice_heun_steps(
        n_steps, rebuild, force, friction_w_neighbour, "com", gs, C, 2,
        X, old_v, n, jnp.float32(p.dt), jnp.float32(cube), jnp.int32(0),
        polarity_precompute, pallas, None, None, jnp.float32(p.r_max),
        ecap, max(e_b, 8), 0)

import yalla_tpu.ops.lattice_planes as PL
PL_orig = PL.planes_supported
for tag, use in (("flat", False), ("planes", True)):
    PL.planes_supported = PL_orig if use else (lambda *a, **k: False)
    lattice_heun_steps.clear_cache()   # same static key both ways
    out = run(8)
    _ = float(np.asarray(out[0].x)[0])
    t0 = time.perf_counter()
    out = run(8)
    _ = float(np.asarray(out[0].x)[0])
    dtm = time.perf_counter() - t0
    aux = out[2]
    errs = {k: float(np.max(np.asarray(v))) for k, v in aux.items()
            if k.startswith("__err") and float(np.max(np.asarray(v)))}
    print(f"{tag}: {dtm/8*1000:.1f} ms/step "
          f"({n_cells*8/dtm:.3g} c-s/s) errs={errs}", flush=True)
PL.planes_supported = PL_orig
