"""Isolate the planes-vs-flat cost: time ONE pairwise pass (operand
construction + kernel + unpack) and the planes transposes alone.
Usage: python benchmarks/diag_planes_pass.py [n] [C] [cube_mult]
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
from yalla_tpu.ops.lattice_xla import (lattice_build, lattice_grid_for,
                                       lattice_heun_steps)
from yalla_tpu.ops.lattice_pallas import lattice_pairwise_pallas
from yalla_tpu.ops.lattice_planes import (_to_planes,
                                          lattice_pairwise_planes)
from yalla_tpu.polarity import polarity_precompute
from yalla_tpu.inits import relu_force

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
C = int(sys.argv[2]) if len(sys.argv) > 2 else 8
cm = float(sys.argv[3]) if len(sys.argv) > 3 else 1.1

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

cube = p.r_max * cm
gs = (64, 64, 64)
from yalla_tpu.solvers import augment
lay = lattice_build(X, old_v, n, jnp.float32(cube), gs, C, extras_cap=2048)
lay = lay._replace(T=augment(lay.T, n, polarity_precompute),
                   E=augment(lay.E, n, polarity_precompute))
print(f"# extras live: {int(lay.n_extras)} dropped {int(lay.n_dropped)}",
      flush=True)


def timeit(tag, fn, *args):
    out = jax.jit(fn)(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(8):
        out = jax.jit(fn)(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / 8
    print(f"{tag}: {dt*1000:.2f} ms/pass", flush=True)


def pass_flat(T, Tov):
    l2 = lay._replace(T=T, Tov=Tov)
    return lattice_pairwise_pallas(
        force, friction_w_neighbour, l2, n, jnp.float32(cube),
        grid_size=gs, capacity=C, z_block=2, extras_block_cap=16,
        planes=False)[0].x


def pass_planes(T, Tov):
    l2 = lay._replace(T=T, Tov=Tov)
    return lattice_pairwise_planes(
        force, friction_w_neighbour, l2, n, jnp.float32(cube),
        grid_size=gs, capacity=C, z_block=2, extras_block_cap=16)[0].x


def transposes(T, Tov):
    out = 0.0
    for a in jax.tree.leaves(T) + [Tov.x, Tov.y, Tov.z]:
        out = out + _to_planes(a, 64, 64, 64, C // 2, 2)[0, 0, 0, 0]
    return out


timeit("flat pass", pass_flat, lay.T, lay.Tov)
timeit("planes pass", pass_planes, lay.T, lay.Tov)
timeit("planes transposes (all channels)", transposes, lay.T, lay.Tov)


def pass_preplaned(T, Tov):
    from yalla_tpu.ops.lattice_planes import planeify_layout
    l2 = planeify_layout(lay._replace(T=T, Tov=Tov), gs, C)
    return lattice_pairwise_planes(
        force, friction_w_neighbour, l2, n, jnp.float32(cube),
        grid_size=gs, capacity=C, z_block=2, extras_block_cap=16,
        pre_planed=True)[0].x


def planeify_only(T, Tov):
    from yalla_tpu.ops.lattice_planes import planeify_layout
    l2 = planeify_layout(lay._replace(T=T, Tov=Tov), gs, C)
    return l2.T.x[0] + l2.Tov.x[0] + l2.pid[0]


timeit("pre-planed pass (incl. planeify)", pass_preplaned, lay.T, lay.Tov)
timeit("planeify only", planeify_only, lay.T, lay.Tov)


import yalla_tpu.ops.lattice_planes as PLmod


def pass_preplaned_unroll(T, Tov):
    from yalla_tpu.ops.lattice_planes import planeify_layout
    l2 = planeify_layout(lay._replace(T=T, Tov=Tov), gs, C)
    return lattice_pairwise_planes(
        force, friction_w_neighbour, l2, n, jnp.float32(cube),
        grid_size=gs, capacity=C, z_block=2, extras_block_cap=16,
        pre_planed=True)[0].x


PLmod.UNROLL_PJ = True
timeit("pre-planed pass UNROLL_PJ", pass_preplaned_unroll, lay.T, lay.Tov)
PLmod.UNROLL_PJ = False

from yalla_tpu.inits import relu_force as _relu


def pass_flat_relu(T, Tov):
    l2 = lay._replace(T=T, Tov=Tov)
    return lattice_pairwise_pallas(
        _relu, friction_w_neighbour, l2, n, jnp.float32(cube),
        grid_size=gs, capacity=C, z_block=2, extras_block_cap=16,
        planes=False)[0].x


def pass_planes_relu(T, Tov):
    from yalla_tpu.ops.lattice_planes import planeify_layout
    l2 = planeify_layout(lay._replace(T=T, Tov=Tov), gs, C)
    return lattice_pairwise_planes(
        _relu, friction_w_neighbour, l2, n, jnp.float32(cube),
        grid_size=gs, capacity=C, z_block=2, extras_block_cap=16,
        pre_planed=True)[0].x


timeit("flat pass (relu force)", pass_flat_relu, lay.T, lay.Tov)
timeit("planes pre-planed (relu force)", pass_planes_relu, lay.T, lay.Tov)
