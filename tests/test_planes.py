"""Slot-plane lattice kernel (ops/lattice_planes.py) vs the XLA resident
oracle and the flat Pallas kernel: identical pair sums on every channel
class (forces, friction, mean-velocity, aux counters, overflow extras).
"""
import jax
import jax.numpy as jnp
import numpy as np

from helpers import isclose
from yalla_tpu.dtypes import Float3, make_pt
from yalla_tpu.ops.common import friction_w_neighbour
from yalla_tpu.ops.lattice_xla import (lattice_build,
                                       lattice_pairwise_resident)
from yalla_tpu.ops.lattice_pallas import lattice_pairwise_pallas
from yalla_tpu.ops.lattice_planes import (lattice_pairwise_planes,
                                          planes_supported)

Cell = make_pt("PlaneCell", "w", "ctype")


def _state(n, n_pad, seed, spread):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-spread, spread, (n_pad, 3))
    pos[n:] = 0.0
    X = Cell(x=jnp.asarray(pos[:, 0], jnp.float32),
             y=jnp.asarray(pos[:, 1], jnp.float32),
             z=jnp.asarray(pos[:, 2], jnp.float32),
             w=jnp.asarray(rng.random(n_pad), jnp.float32),
             ctype=jnp.asarray((rng.random(n_pad) < 0.5)
                               .astype(np.float32)))
    ov = Float3(x=X.x * 0.01, y=X.y * -0.02, z=X.z * 0.03)
    return X, ov


def force(Xi, r, dist, i, j):
    """Type-dependent clipped spring + diffusive w + a neighbour
    counter: exercises dF, aux, friction and the i == j diagonal."""
    offd = (i != j) & (dist < 1.0)
    safe = jnp.where(dist > 0, dist, 1.0)
    k = jnp.where(r.ctype == 0.0, 1.0, 0.4)
    w = jnp.where(offd, k * (0.6 - dist) / safe, 0.0)
    dw = jnp.where(offd, -0.2 * r.w, 0.05 * Xi.w * (i == j))
    zero = jnp.zeros_like(dist)
    dF = Cell(x=r.x * w, y=r.y * w, z=r.z * w, w=dw, ctype=zero)
    return dF, {"nbs": jnp.where(offd, 1.0, 0.0)}


def _compare(a, b, n_map, tag):
    Fa, fa, va, auxa = a[:4]
    Fb, fb, vb, auxb = b[:4]
    for f in Fa._fields:
        assert isclose(np.asarray(getattr(Fa, f))[n_map],
                       np.asarray(getattr(Fb, f))[n_map]), f"{tag} F.{f}"
    assert isclose(np.asarray(fa)[n_map], np.asarray(fb)[n_map]), \
        f"{tag} sum_f"
    for c in range(3):
        assert isclose(np.asarray(va[c])[n_map],
                       np.asarray(vb[c])[n_map]), f"{tag} sum_v[{c}]"
    for k in auxa:
        if k.startswith("__err_") or k.startswith("stale"):
            continue
        assert isclose(np.asarray(auxa[k])[n_map],
                       np.asarray(auxb[k])[n_map]), f"{tag} aux {k}"


def _run(gs, C, zb, n, n_pad, seed=5, spread=None, extras_cap=0,
         ebc=16):
    from yalla_tpu.ops.common import grid_dims
    gx, gy, gz = grid_dims(gs)
    spread = spread if spread is not None else min(gx, gy, gz) * 0.45
    X, ov = _state(n, n_pad, seed, spread)
    lay = lattice_build(X, ov, jnp.int32(n), jnp.float32(1.0), gs, C,
                        extras_cap=extras_cap)
    assert int(lay.n_dropped) == 0, "fixture must not drop"
    kw = dict(grid_size=gs, capacity=C, z_block=zb)
    oracle = lattice_pairwise_resident(force, friction_w_neighbour, lay,
                                       jnp.int32(n), jnp.float32(1.0),
                                       **kw)
    planes = lattice_pairwise_planes(force, friction_w_neighbour, lay,
                                     jnp.int32(n), jnp.float32(1.0),
                                     extras_block_cap=ebc, **kw)
    occ = np.asarray(lay.pid) < n_pad
    _compare(oracle, planes, occ, f"gs={gs} C={C}")
    return lay, oracle, planes


def test_planes_matches_oracle_r1():
    """P = 8, R = 1 (gx = 16, C = 8)."""
    assert planes_supported(16, 8)
    _run(16, 8, 2, 600, 1024)


def test_planes_matches_oracle_r2_aniso():
    """P = 8, R = 2 (gx = 16, C = 16), anisotropic grid."""
    assert planes_supported((16, 8, 24), 16)
    _run((16, 8, 24), 16, 2, 500, 1024, spread=3.5)


def test_planes_matches_oracle_p4():
    """P = 4 packs (gx = 32, C = 8)."""
    assert planes_supported(32, 8)
    _run(32, 8, 4, 800, 1024, spread=6.0)


def test_planes_extras_match_flat_kernel():
    """Overflow extras: the planes kernel's sidecar must agree with the
    flat Pallas kernel's on both the lattice and the extras outputs."""
    gs, C, zb = 16, 8, 2
    n, n_pad = 900, 1024
    X, ov = _state(n, n_pad, 9, 3.2)
    lay = lattice_build(X, ov, jnp.int32(n), jnp.float32(1.0), gs, C,
                        extras_cap=256)
    assert int(lay.n_dropped) == 0
    assert int(lay.n_extras) > 0, "fixture must actually spill"
    kw = dict(grid_size=gs, capacity=C, z_block=zb, extras_block_cap=24)
    flat = lattice_pairwise_pallas(force, friction_w_neighbour, lay,
                                   jnp.int32(n), jnp.float32(1.0), **kw)
    planes = lattice_pairwise_planes(force, friction_w_neighbour, lay,
                                     jnp.int32(n), jnp.float32(1.0), **kw)
    occ = np.asarray(lay.pid) < n_pad
    _compare(flat, planes, occ, "extras-lattice")
    el = np.asarray(lay.epid) < n_pad
    _compare(flat[4], planes[4], el, "extras-side")
    assert float(planes[4][3]["__err_extras_block"]) == 0.0


def test_preplaned_chunks_match_default():
    """PLANES_CHUNKS mode: planeified resident chunks through
    lattice_heun_steps reproduce the default path exactly (same physics,
    different slot order + kernel)."""
    import yalla_tpu.ops.lattice_xla as LX
    from yalla_tpu.ops.lattice_xla import lattice_heun_steps

    n, n_pad = 600, 1024
    X, ov = _state(n, n_pad, 13, 6.5)
    args = (force, friction_w_neighbour, "com", 16, 8, 2)

    def run():
        lattice_heun_steps.clear_cache()
        return lattice_heun_steps(
            4, 2, *args, X, ov, jnp.int32(n), jnp.float32(0.05),
            jnp.float32(1.0), jnp.int32(0), None, True, None, None,
            jnp.float32(1.0))

    Xa, ova, auxa = run()
    old = LX.PLANES_CHUNKS
    try:
        LX.PLANES_CHUNKS = True
        Xb, ovb, auxb = run()
    finally:
        LX.PLANES_CHUNKS = old
        lattice_heun_steps.clear_cache()
    for f in Xa._fields:
        assert isclose(np.asarray(getattr(Xa, f))[:n],
                       np.asarray(getattr(Xb, f))[:n]), f
    for k in auxa:
        if k.startswith("stale"):
            continue
        assert isclose(np.asarray(auxa[k], np.float32),
                       np.asarray(auxb[k], np.float32)), k
