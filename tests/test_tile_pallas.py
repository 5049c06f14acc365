"""The N^2 Pallas tile kernel (small-N latency path) against the XLA
all-pairs oracle: same contract as ``tile_pairwise`` including i == j
diagonal terms, friction sums, and aux channels (ref compute_tile,
solvers.cuh:282-339)."""
import numpy as np
import jax.numpy as jnp

from helpers import isclose
from yalla_tpu.dtypes import Float3, make_pt
from yalla_tpu.ops.common import friction_w_neighbour
from yalla_tpu.ops.pairwise_xla import tile_pairwise
from yalla_tpu.ops.tile_pallas import tile_pairwise_pallas

Cell = make_pt("TPC", "w", "ctype")


def _state(n_pad, seed=5):
    rng = np.random.default_rng(seed)
    return (Cell(x=jnp.asarray(rng.uniform(-3, 3, n_pad), jnp.float32),
                 y=jnp.asarray(rng.uniform(-3, 3, n_pad), jnp.float32),
                 z=jnp.asarray(rng.uniform(-3, 3, n_pad), jnp.float32),
                 w=jnp.asarray(rng.random(n_pad), jnp.float32),
                 ctype=jnp.asarray((rng.random(n_pad) < 0.5)
                                   .astype(np.float32))),
            Float3(x=jnp.asarray(rng.random(n_pad), jnp.float32),
                   y=jnp.asarray(rng.random(n_pad), jnp.float32),
                   z=jnp.asarray(rng.random(n_pad), jnp.float32)))


def _force(Xi, r, dist, i, j):
    """Type-dependent clipped spring + diagonal reaction + aux count --
    exercises ids, diagonal, type logic, and the aux channel."""
    diag = i == j
    near = (~diag) & (dist < 1.0)
    safe = jnp.where(dist > 0, dist, 1.0)
    w = jnp.where(near, (0.6 - dist) / safe, 0.0)
    w = w * jnp.where(r.ctype == 0.0, 1.5, 0.7)
    dw = jnp.where(near, -0.1 * r.w, 0.0) \
        + jnp.where(diag, 0.02 * Xi.w, 0.0)
    zero = jnp.zeros_like(dist)
    return (Cell(x=r.x * w, y=r.y * w, z=r.z * w, w=dw, ctype=zero),
            {"nbs": jnp.where(near, 1.0, 0.0)})


def test_tile_pallas_matches_xla():
    n, n_pad = 200, 256
    X, ov = _state(n_pad)
    a = tile_pairwise(_force, friction_w_neighbour, X, ov, jnp.int32(n))
    b = tile_pairwise_pallas(_force, friction_w_neighbour, X, ov,
                             jnp.int32(n))
    for f in Cell._fields:
        assert isclose(np.asarray(getattr(a[0], f))[:n],
                       np.asarray(getattr(b[0], f))[:n]), f
    assert isclose(np.asarray(a[1])[:n], np.asarray(b[1])[:n]), "sum_f"
    for c in range(3):
        assert isclose(np.asarray(a[2][c])[:n],
                       np.asarray(b[2][c])[:n]), f"sum_v{c}"
    assert isclose(np.asarray(a[3]["nbs"])[:n],
                   np.asarray(b[3]["nbs"])[:n]), "aux"


def test_tile_engine_pallas_step():
    """TileEngine(pallas=True) drops into the generic integrator."""
    from yalla_tpu.solvers import TileEngine, heun_steps

    n, n_pad = 120, 128
    X, ov = _state(n_pad, seed=9)
    args = (jnp.int32(n), jnp.float32(0.05), jnp.float32(1.0),
            jnp.int32(0), None)
    Xa, _, _ = heun_steps(3, TileEngine(), _force, friction_w_neighbour,
                          None, "com", X, ov, *args)
    Xb, _, _ = heun_steps(3, TileEngine(pallas=True), _force,
                          friction_w_neighbour, None, "com", X, ov, *args)
    for f in ("x", "y", "z", "w"):
        assert isclose(np.asarray(getattr(Xa, f))[:n],
                       np.asarray(getattr(Xb, f))[:n]), f
