"""Overflow-extras tests: the lattice at a capacity BELOW the worst cube
occupancy, with spilled cells riding the exactly-handled side list
(``lattice_build(extras_cap=...)`` + the Pallas kernel's sidecar tables).

Oracle: the same trajectory at a capacity that fits every cube.  The two
must agree to f32 roundoff -- extras are a layout choice, not a physics
approximation (unlike capacity drops, which silently lose pairs and are
flagged, ref solvers.cuh:82,90).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yalla_tpu.dtypes import Float3, make_pt
from yalla_tpu.inits import relu_force
from yalla_tpu.ops.common import friction_w_neighbour
from yalla_tpu.ops.lattice_xla import lattice_build, lattice_heun_steps

from helpers import isclose


def _clumped_state(Cell, n, n_pad, seed=3, fields=()):
    """A tight clump (overflows small capacities) plus scattered cells."""
    rng = np.random.default_rng(seed)
    pos = np.concatenate([rng.uniform(-0.45, 0.45, (n // 4, 3)),
                          rng.uniform(-5.5, 5.5, (n - n // 4, 3))])
    pos = np.concatenate([pos, np.zeros((n_pad - n, 3))])
    extra = {f: jnp.asarray(rng.random(n_pad), jnp.float32)
             for f in fields}
    X = Cell(x=jnp.asarray(pos[:, 0], jnp.float32),
             y=jnp.asarray(pos[:, 1], jnp.float32),
             z=jnp.asarray(pos[:, 2], jnp.float32), **extra)
    return X, Float3.zeros(n_pad), jnp.int32(n)


def test_build_diverts_overflow_to_extras():
    Cell = make_pt("XC")
    X, ov, n = _clumped_state(Cell, 96, 128)
    lay = lattice_build(X, ov, n, 1.0, 32, 2, extras_cap=64)
    assert int(lay.n_extras) > 0
    assert int(lay.n_dropped) == 0
    # every active cell is either in a slot or in the extras list
    n_slots = lay.pid.shape[0]
    in_slot = np.asarray(lay.slot_of[:96]) < n_slots
    in_extras = np.isin(np.arange(96), np.asarray(lay.epid))
    assert np.all(in_slot | in_extras)
    assert not np.any(in_slot & in_extras)


def test_extras_match_full_capacity_relu():
    Cell = make_pt("XC")
    X, ov, n = _clumped_state(Cell, 96, 128)

    def run(C, extras):
        return lattice_heun_steps(
            4, 2, relu_force, friction_w_neighbour, "com", 32, C, 2,
            X, ov, n, jnp.float32(0.05), jnp.float32(1.0), jnp.int32(0),
            None, True, None, None, None, extras, 16)

    Xa, _, auxa = run(8, 0)          # capacity 8 fits everything
    assert int(auxa["__err_lattice_dropped"]) == 0
    Xb, _, auxb = run(4, 64)         # capacity 4 + extras
    assert int(auxb["__err_lattice_dropped"]) == 0
    assert float(auxb["__err_extras_block"]) == 0
    for f in ("x", "y", "z"):
        assert isclose(np.asarray(getattr(Xa, f))[:96],
                       np.asarray(getattr(Xb, f))[:96]), f


@pytest.mark.parametrize("rebuild", [2, 1])
def test_extras_match_full_capacity_branching(rebuild):
    """Full flagship physics (aux counters, diagonal reaction, friction,
    polarity precompute) through the extras path, both rebuild cadences."""
    from yalla_tpu.models import branching as B
    from yalla_tpu.polarity import polarity_precompute

    p = B.Params()
    force = B.make_force(p)
    rng = np.random.default_rng(7)
    n, n_pad = 120, 128
    pos = np.concatenate([rng.uniform(-0.5, 0.5, (24, 3)),
                          rng.uniform(-6, 6, (96, 3))])
    pos = np.concatenate([pos, np.zeros((n_pad - n, 3))])
    surf = rng.random(n_pad) < 0.5
    X = B.Cell(x=jnp.asarray(pos[:, 0], jnp.float32),
               y=jnp.asarray(pos[:, 1], jnp.float32),
               z=jnp.asarray(pos[:, 2], jnp.float32),
               theta=jnp.asarray(np.where(surf, 1.0, 0.0), jnp.float32),
               phi=jnp.asarray(rng.random(n_pad), jnp.float32),
               u=jnp.asarray(rng.random(n_pad), jnp.float32),
               v=jnp.asarray(rng.random(n_pad), jnp.float32),
               ctype=jnp.asarray(surf.astype(np.float32)))
    ov = Float3(x=jnp.asarray(rng.random(n_pad) * .1, jnp.float32),
                y=jnp.asarray(rng.random(n_pad) * .1, jnp.float32),
                z=jnp.asarray(rng.random(n_pad) * .1, jnp.float32))
    nn = jnp.int32(n)

    def run(C, extras):
        return lattice_heun_steps(
            2, rebuild, force, friction_w_neighbour, "com", 32, C, 2,
            X, ov, nn, jnp.float32(p.dt), jnp.float32(p.r_max),
            jnp.int32(0), polarity_precompute, True, None, None, None,
            extras, 16)

    Xa, _, auxa = run(16, 0)
    assert int(auxa["__err_lattice_dropped"]) == 0
    Xb, _, auxb = run(4, 64)
    assert int(auxb["__err_lattice_dropped"]) == 0
    assert float(auxb["__err_extras_block"]) == 0
    for f in B.Cell._fields:
        assert isclose(np.asarray(getattr(Xa, f))[:n],
                       np.asarray(getattr(Xb, f))[:n]), f
    for k in ("epi_nbs", "mes_nbs"):
        assert isclose(np.asarray(auxa[k])[:n], np.asarray(auxb[k])[:n]), k
