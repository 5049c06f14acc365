"""Multi-chip consistency: the shard_map step over an 8-device CPU mesh
must reproduce the single-chip trajectory (the cross-engine oracle of
``test_solvers.test_compare_methods`` applied across device counts)."""
import jax
import jax.numpy as jnp
import numpy as np

from helpers import isclose
from yalla_tpu import Float3, GridEngine, Solution, TileEngine
from yalla_tpu.inits import random_sphere, set_seed
from yalla_tpu.parallel.spmd import (make_cells_mesh, make_sharded_step,
                                     shard_state)

set_seed(2024)


def clipped_spring(Xi, r, dist, i, j):
    valid = (i != j) & (dist < 1.0)
    safe = jnp.where(dist > 0, dist, 1.0)
    w = jnp.where(valid, (0.5 - dist) / safe, 0.0)
    return jax.tree.map(lambda a: jnp.zeros_like(w), Xi)._replace(
        x=r.x * w, y=r.y * w, z=r.z * w)


def _run_single(engine_kind, n, steps):
    pts = Solution(Float3, n, solver=engine_kind)
    random_sphere(0.733333, pts)
    ref = pts.pt_type(*[f.copy() for f in pts.h_X])
    for _ in range(steps):
        pts.take_step(0.1, clipped_spring)
    return ref, pts.copy_to_host()


def _run_sharded(engine, init_h, n, n_pad, steps):
    mesh = make_cells_mesh()
    X = Float3(*[jnp.asarray(f) for f in init_h])
    old_v = Float3.zeros(n_pad)
    X, old_v = shard_state(mesh, X, old_v)
    step = make_sharded_step(mesh, engine, clipped_spring, n_steps=steps)
    X, old_v = step(X, old_v, jnp.int32(n), jnp.float32(0.1),
                    jnp.float32(1.0), jnp.int32(0))
    return Float3(*[np.asarray(f) for f in X])


def test_sharded_tile_matches_single():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    n = 50
    init, single = _run_single("tile", n, 2)
    sharded = _run_sharded(TileEngine(), init, n, 64, 2)
    assert isclose(sharded.x[:n], single.x[:n]), "Sharded tile disagrees in x"
    assert isclose(sharded.y[:n], single.y[:n]), "Sharded tile disagrees in y"
    assert isclose(sharded.z[:n], single.z[:n]), "Sharded tile disagrees in z"


def test_sharded_grid_matches_single():
    n = 50
    init, single = _run_single("grid", n, 2)
    sharded = _run_sharded(GridEngine(), init, n, 64, 2)
    assert isclose(sharded.x[:n], single.x[:n]), "Sharded grid disagrees in x"
    assert isclose(sharded.y[:n], single.y[:n]), "Sharded grid disagrees in y"
    assert isclose(sharded.z[:n], single.z[:n]), "Sharded grid disagrees in z"
