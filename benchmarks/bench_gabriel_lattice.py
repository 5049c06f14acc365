"""growth_w_wall-class step (100k cells, Gabriel + wall + protrusions)
with the dense-lattice Pallas Gabriel kernel (ops/gabriel_pallas.py).
Same synthetic half-space tissue as bench_growth_w_wall.py; compares the
engine's step rate at the reference's own scale (growth_w_wall.cu:23).
Usage: python benchmarks/bench_gabriel_lattice.py [n] [steps] [C] [NC]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

import growth_w_wall as G  # noqa: E402
from yalla_tpu import Float3, Solution  # noqa: E402
from yalla_tpu.links import Links, link_wall_forces  # noqa: E402
from yalla_tpu.solvers import GabrielEngine  # noqa: E402
from yalla_tpu.ops.lattice_xla import lattice_grid_for  # noqa: E402

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
C = int(sys.argv[3]) if len(sys.argv) > 3 else 8
# 20 is the certified BASELINE.md config; 16 overflows __err_gabriel_
# candidates on this geometry (the in-loop flag aborts the run)
NC = int(sys.argv[4]) if len(sys.argv) > 4 else 20

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

rng = np.random.default_rng(0)
side = int(np.ceil((2 * n_cells) ** (1 / 3)))
g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
             -1).reshape(-1, 3)
pos = (g - side / 2) * 0.75 + rng.uniform(-0.2, 0.2, (len(g), 3))
pos = pos[pos[:, 2] > 0.2]

extent = float(np.abs(pos).max()) + 0.5
gs = lattice_grid_for(extent, G.r_max, C)
# measured max occupancy (capacity must cover it; the in-loop flags
# certify no drop during the timed run)
cid = 0
for c in range(3):
    cid = cid * gs + np.clip(np.floor(pos[:, c]).astype(np.int64) + gs // 2,
                             0, gs - 1)
occ = int(np.bincount(cid).max())
print(f"n={n_cells} extent={extent:.1f} max_occ={occ} -> gs={gs} C={C} "
      f"NC={NC}", file=sys.stderr)
assert occ <= C, f"capacity {C} below measured occupancy {occ}"

engine = GabrielEngine(lattice=True, grid_size=gs, capacity=C,
                       max_candidates=NC,
                       gabriel_coefficient=0.8)
cells = Solution(Float3, n_cells, cube_size=G.r_max, engine=engine)
n_pad = cells.n_pad
take = pos[:n_pad - 1]
h = cells.h_X
h.x[1:1 + len(take)] = take[:, 0]
h.y[1:1 + len(take)] = take[:, 1]
h.z[1:1 + len(take)] = take[:, 2]
cells.h_n = min(n_cells, len(take) + 1)
cells.copy_to_device()

prot = Links(n_cells, G.protrusion_strength, seed=15)
prot.set_d_n(cells.h_n)
gen = link_wall_forces(prot, G.WALL)

t0 = time.perf_counter()
aux = cells.take_steps(n_steps, G.dt, G.relu_force,
                       pw_friction=G.wall_friction, gen_forces=gen)
_ = float(np.asarray(cells.d_X.x)[0])
print(f"compile+warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)
for k, v in aux.items():
    if k.startswith("__err"):
        m = float(np.max(np.asarray(v)))
        print(f"  {k}: {m}", file=sys.stderr)
        assert m == 0.0, k

t0 = time.perf_counter()
aux = cells.take_steps(n_steps, G.dt, G.relu_force,
                       pw_friction=G.wall_friction, gen_forces=gen)
_ = float(np.asarray(cells.d_X.x)[0])
dt_s = (time.perf_counter() - t0) / n_steps
print(f"lattice Gabriel: {dt_s * 1e3:.0f} ms/step "
      f"({cells.h_n / dt_s:.3g} cell-steps/s)")
