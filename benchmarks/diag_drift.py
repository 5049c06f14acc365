"""Occupancy / extras drift across the timed bench window at 500k.

The round-3 certification ladder loses its resident-cadence rungs to
__err_extras_block / __err_lattice_dropped: the extras tables are sized
from the chunk-START state, but the settled tissue apparently keeps
compressing during the 32 timed steps.  This prints, per 4-step chunk,
the max cube occupancy and the extras count a fresh rebuild would see --
telling settling-deficit apart from planning-deficit.
Usage: python benchmarks/diag_drift.py [n] [chunks] [cube_mult] [C]
"""
import sys
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench
from yalla_tpu.dtypes import Float3
from yalla_tpu.models import branching as B
from yalla_tpu.ops.common import friction_w_neighbour
from yalla_tpu.ops.lattice_xla import lattice_heun_steps
from yalla_tpu.polarity import polarity_precompute
from yalla_tpu.inits import relu_force

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 12
cm = float(sys.argv[3]) if len(sys.argv) > 3 else 1.38
C = int(sys.argv[4]) if len(sys.argv) > 4 else 12

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
from yalla_tpu.ops.lattice_xla import lattice_grid_for
_, extent0 = bench._max_occ(X, n_cells, 64, p.r_max)
gs0 = lattice_grid_for(extent0 * 1.04 + 1.0, p.r_max, 8)
for pw, pre in ((relu_force, None), (force, polarity_precompute)):
    X, old_v, aux = lattice_heun_steps(
        bench.RELAX_STEPS, bench.REBUILD_EVERY, pw, friction_w_neighbour,
        "com", gs0, 8, 2, X, old_v, n, jnp.float32(p.dt),
        jnp.float32(p.r_max), jnp.int32(0), pre, pallas)

cube = p.r_max * cm
dims = (64, 56, 56)
def stats(X, tag):
    occ, _ = bench._max_occ(X, n_cells, 96, cube)
    n_e, e_blk = bench._extras_plan(X, n_cells, dims, cube, C, 2, 8)
    print(f"{tag}: max_occ={occ} extras={n_e} per_block_need={e_blk}",
          flush=True)

stats(X, "after settle (48+48)")
for k in range(chunks):
    X, old_v, aux = lattice_heun_steps(
        4, 4, force, friction_w_neighbour, "com", dims, 16, 2,
        X, old_v, n, jnp.float32(p.dt), jnp.float32(cube),
        jnp.int32(0), polarity_precompute, pallas)
    stats(X, f"chunk {k} (step {4*(k+1)}) dropped="
          f"{int(aux['__err_lattice_dropped'])}")
