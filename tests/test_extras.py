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


def test_build_route_mask_forces_extras():
    """route_mask sends cells to extras even when their cube has room,
    without disturbing unrouted cells' slots."""
    Cell = make_pt("XC")
    X, ov, n = _clumped_state(Cell, 96, 128)
    route = jnp.zeros(128, bool).at[jnp.array([3, 40, 77])].set(True)
    lay = lattice_build(X, ov, n, 1.0, 32, 8, extras_cap=64,
                        route_mask=route)
    assert int(lay.n_dropped) == 0
    epid = np.asarray(lay.epid)
    for i in (3, 40, 77):
        assert i in epid, f"routed cell {i} not in extras"
        assert int(lay.slot_of[i]) == lay.pid.shape[0], \
            f"routed cell {i} still owns a lattice slot"
    # partition still holds for every active cell
    in_slot = np.asarray(lay.slot_of[:96]) < lay.pid.shape[0]
    in_extras = np.isin(np.arange(96), epid)
    assert np.all(in_slot | in_extras) and not np.any(in_slot & in_extras)


def test_mover_routing_certifies_resident_cadence():
    """A pair approaching through a 2-cube escape flags the resident
    cadence (honest staleness) -- but with ``route_movers`` the fast
    cells ride the per-pass-exact extras list and the certificate stays
    clean, because extras-side pairs are re-tabled from instantaneous
    positions every pass (no pair can be missed by THEIR motion)."""
    from yalla_tpu.ops.common import friction_w_neighbour

    def no_force(Xi, r, dist, i, j):
        return jax.tree.map(lambda a: jnp.zeros_like(dist), Xi)

    n_pad = 64
    # same geometry as the diagonal-escape staleness test: two cell
    # pairs binned (2, 0, 2) cubes apart at cube 1.1, diagonally
    # approaching 0.0625/axis/step, buddies carrying the velocity
    pos = np.zeros((n_pad, 3), np.float32)
    pos[0] = [1.05, 0.0, 1.05]
    pos[1] = [1.05, 0.5, 1.05]
    pos[2] = [2.25, 0.0, 2.25]
    pos[3] = [2.25, 0.5, 2.25]
    v = np.zeros((n_pad, 3), np.float32)
    v[:2] = [0.0625, 0.0, 0.0625]
    v[2:4] = [-0.0625, 0.0, -0.0625]
    X = Float3(x=jnp.asarray(pos[:, 0]), y=jnp.asarray(pos[:, 1]),
               z=jnp.asarray(pos[:, 2]))
    ov = Float3(x=jnp.asarray(v[:, 0]), y=jnp.asarray(v[:, 1]),
                z=jnp.asarray(v[:, 2]))

    def run(rebuild, route):
        return lattice_heun_steps(
            4, rebuild, no_force, friction_w_neighbour, "point", 16, 8, 4,
            X, ov, jnp.int32(4), jnp.float32(1.0), jnp.float32(1.1),
            jnp.int32(0), None, True, None, None, jnp.float32(1.0),
            64, 16, 0, False, route)

    _, _, aux0 = run(4, 0.0)
    assert float(aux0["__err_stale"]) == 1.0, "escape must flag unrouted"
    Xr, _, aux1 = run(4, 2.0)
    assert float(aux1["__err_stale"]) == 0.0, (
        f"routed movers still flagged "
        f"(closure={float(aux1['stale_shear_closure'])})")
    assert float(aux1["__err_lattice_dropped"]) == 0
    assert float(aux1["__err_extras_block"]) == 0
    # certified-clean resident chunk == the rebuild-per-pass oracle
    Xo, _, _ = run(1, 0.0)
    for f in ("x", "y", "z"):
        assert isclose(np.asarray(getattr(Xr, f))[:4],
                       np.asarray(getattr(Xo, f))[:4]), f
