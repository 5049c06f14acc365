"""Tests for the proliferation framework and the flagship branching model:
prefix-sum slot allocation, field splitting, capacity overflow, lineage
recording, and a short branching run (growth + sane fields)."""
import jax
import jax.numpy as jnp
import numpy as np

from yalla_tpu import Float4
from yalla_tpu.growth import lineage_init, proliferate, record_divisions


def _mk_state(n_pad, n):
    X = Float4(x=jnp.arange(n_pad, dtype=jnp.float32),
               y=jnp.zeros(n_pad), z=jnp.zeros(n_pad),
               w=jnp.full(n_pad, 2.0))
    old_v = Float4(x=jnp.full(n_pad, 0.5), y=jnp.zeros(n_pad),
                   z=jnp.zeros(n_pad), w=jnp.zeros(n_pad))
    return X, old_v, jnp.int32(n)


def want_all(X, props, rnd, i, n):
    return i < n


def child_half_w(X, props, direction, i):
    parent = X.replace(w=X.w / 2)
    child = parent.replace(x=X.x + 0.1 * direction.x)
    return parent, child


def test_proliferate_all_divide():
    X, old_v, n = _mk_state(16, 4)
    key = jax.random.PRNGKey(0)
    X2, ov2, n2, _, info = proliferate(want_all, child_half_w, X, old_v, n,
                                       key)
    assert int(n2) == 8
    assert int(info.n_divided) == 4
    # conserved field halved in both parent and daughter
    assert np.allclose(np.asarray(X2.w)[:8], 1.0)
    # daughters inherit old_v (ref: d_old_v[n] = d_old_v[i])
    assert np.allclose(np.asarray(ov2.x)[:8], 0.5)
    # daughter slots n..n+3 assigned in prefix-sum order
    assert np.allclose(np.asarray(X2.x)[4:8],
                       np.asarray(X.x)[:4] + 0.1 *
                       (np.asarray(X2.x)[4:8] - np.asarray(X.x)[:4]) / 0.1)


def test_proliferate_capacity_drop():
    """Divisions that would exceed capacity are dropped, not wrapped."""
    X, old_v, n = _mk_state(8, 6)
    X2, ov2, n2, _, info = proliferate(want_all, child_half_w, X, old_v, n,
                                       jax.random.PRNGKey(1))
    assert int(n2) == 8  # only 2 slots were available
    assert int(info.n_divided) == 2
    # cells whose division was dropped keep their fields unchanged
    assert np.allclose(np.asarray(X2.w)[2:6], 2.0)


def test_lineage_recording():
    n_pad, n_0 = 16, 4
    X, old_v, n = _mk_state(n_pad, n_0)
    lin = lineage_init(32, n_pad, n_0)
    assert np.array_equal(np.asarray(lin.cell_clone)[:4], [1, 2, 3, 4])

    X2, ov2, n2, _, info = proliferate(want_all, child_half_w, X, old_v, n,
                                       jax.random.PRNGKey(2))
    lin = record_divisions(lin, info, X2, jnp.zeros(n_pad, jnp.int32), 0.25)
    assert int(lin.n_nodes) == 4
    cp = np.asarray(lin.cell_parent)
    # each dividing cell and its daughter point at the same new node
    for i in range(4):
        assert cp[i] == cp[4 + i] == i
    # daughters share the parent clone
    cc = np.asarray(lin.cell_clone)
    assert np.array_equal(cc[4:8], cc[:4])
    assert np.allclose(np.asarray(lin.node_time)[:4], 0.25)


def test_branching_model_short():
    from yalla_tpu.models import branching as B
    p = B.Params(prolif_threshold=-100.0)  # let mesenchyme divide freely
    state, cells, engine = B.init_state(
        100, 300, p, engine=B.GridEngine(grid_size=32, row_cap=32), seed=3)
    n0 = int(state.n)
    assert n0 == 100
    # the shell is epithelial, the core stays mesenchymal
    ctype = np.asarray(state.X.ctype)
    assert 0 < ctype.sum() < 100

    frame = B.make_frame(p, engine, substeps=5)
    state, errs = frame(state, jnp.float32(0.1))
    state, errs = frame(state, jnp.float32(0.2))
    assert not any(float(v) for v in errs.values()), errs
    n_final = int(state.n)
    assert n_final > n0, "no proliferation happened"
    assert n_final <= cells.n_pad
    x = np.asarray(state.X.x)[:n_final]
    assert np.all(np.isfinite(x)), "NaN/inf positions"
    assert int(state.lineage.n_nodes) == n_final - n0


def test_frame_error_flags_and_engine_resize():
    """A frame whose tissue outruns the lattice grid reports
    __err_out_of_grid; engine_for_state re-derives a grid that fits and
    the redone frame is clean (the flagship's growth-resize pattern)."""
    from yalla_tpu.models import branching as B
    from yalla_tpu.solvers import LatticeEngine

    p = B.Params()
    state, cells, _ = B.init_state(60, 200, p, seed=3)
    # displace the tissue so it pokes outside a deliberately tiny grid
    state = state._replace(X=state.X.replace(x=state.X.x + 12.0))
    small = LatticeEngine(grid_size=16, capacity=8, z_block=2)
    frame = B.make_frame(p, small, substeps=2)
    _, errs = frame(state, jnp.float32(0.1))
    assert float(errs["__err_out_of_grid"]) > 0

    engine = B.engine_for_state(state, 200, p)
    assert engine.grid_size > 16
    frame2 = B.make_frame(p, engine, substeps=2)
    state2, errs2 = frame2(state, jnp.float32(0.1))
    assert not any(float(v) for v in errs2.values()), errs2
    assert int(state2.n) >= 60


def test_proliferate_windowed_matches_naive():
    """With n_pad > 2048 the windowed (birth_cap < n_pad) path engages;
    daughters must land contiguously at [n, n + k) with exactly the
    full-scatter semantics."""
    n_pad, n = 4096, 3000
    X, old_v, _ = _mk_state(n_pad, n)

    def want_some(X, props, rnd, i, n):
        return (i % 37 == 0) & (i < n)  # 82 scattered dividers

    X2, ov2, n2, _, info = proliferate(
        want_some, child_half_w, X, old_v, jnp.int32(n),
        jax.random.PRNGKey(5))
    parents = np.arange(0, n, 37)
    k = len(parents)
    assert int(n2) == n + k
    assert int(info.n_divided) == k
    x2, w2 = np.asarray(X2.x), np.asarray(X2.w)
    # parents halve w; non-dividers untouched
    assert np.allclose(w2[parents], 1.0)
    untouched = np.setdiff1d(np.arange(n), parents)
    assert np.allclose(w2[untouched], 2.0)
    # daughters: slot n+j holds parent[j]'s x +- 0.1 and halved w
    assert np.allclose(w2[n:n + k], 1.0)
    assert np.all(np.abs(x2[n:n + k] - parents.astype(np.float32)) <= 0.1001)
    # old_v copied to daughters
    assert np.allclose(np.asarray(ov2.x)[n:n + k], 0.5)
    # slots beyond the daughters untouched
    assert np.allclose(w2[n + k:], 2.0)


def test_record_divisions_windowed():
    """Lineage recording through the windowed path (n_pad > 2048)."""
    n_pad, n = 4096, 2500
    X, old_v, _ = _mk_state(n_pad, n)
    lin = lineage_init(8192, n_pad, n)

    def want_some(X, props, rnd, i, n):
        return (i % 111 == 5) & (i < n)

    X2, ov2, n2, _, info = proliferate(
        want_some, child_half_w, X, old_v, jnp.int32(n),
        jax.random.PRNGKey(6))
    parents = np.arange(5, n, 111)
    k = len(parents)
    lin2 = record_divisions(lin, info, X2,
                            jnp.full(n_pad, 7, jnp.int32), 0.5)
    assert int(lin2.n_nodes) == k
    assert np.allclose(np.asarray(lin2.node_time)[:k], 0.5)
    assert np.array_equal(np.asarray(lin2.node_clone)[:k],
                          np.asarray(lin.cell_clone)[parents])
    assert np.all(np.asarray(lin2.node_type)[:k] == 7)
    cp = np.asarray(lin2.cell_parent)
    # parent i and daughter n+j point at node j
    assert np.array_equal(cp[parents], np.arange(k))
    assert np.array_equal(cp[n:n + k], np.arange(k))
    # daughters inherit the parent's clone
    assert np.array_equal(np.asarray(lin2.cell_clone)[n:n + k],
                          np.asarray(lin.cell_clone)[parents])
    # non-dividers keep no parent
    untouched = np.setdiff1d(np.arange(n), parents)
    assert np.all(cp[untouched] == -1)


def test_proliferate_birth_cap_drops_and_counts():
    """Divisions beyond birth_cap are dropped into n_lost (capacity-style
    accounting), and the survivors are the slot-ordered prefix."""
    n_pad, n = 4096, 3000
    X, old_v, _ = _mk_state(n_pad, n)
    X2, ov2, n2, _, info = proliferate(
        want_all, child_half_w, X, old_v, jnp.int32(n),
        jax.random.PRNGKey(7), birth_cap=64)
    assert int(info.n_divided) == 64
    assert int(info.n_lost) == 3000 - 64
    assert int(n2) == 3064
    w2 = np.asarray(X2.w)
    assert np.allclose(w2[:64], 1.0)      # first 64 wants divided
    assert np.allclose(w2[64:3000], 2.0)  # the rest were dropped untouched
    assert np.allclose(w2[3000:3064], 1.0)


def test_repad_state_roundtrip():
    """Tier re-padding preserves live data and fills new slots inertly."""
    from yalla_tpu.models import branching as B
    p = B.Params()
    state, cells, engine = B.init_state(60, 200, p, seed=3,
                                        lineage_cap=1024)
    n = int(state.n)
    big = B.repad_state(state, 1024)
    assert big.X.x.shape[0] == 1024
    assert np.allclose(np.asarray(big.X.x)[:n], np.asarray(state.X.x)[:n])
    assert np.all(np.asarray(big.lineage.cell_parent)[256:] == -1)
    assert np.all(np.asarray(big.lineage.cell_clone)[256:] == 0)
    assert big.lineage.node_x.shape[0] == 1024  # node arrays keep their cap
    # a frame at the new tier runs clean and matches the small-tier frame
    frame_small = B.make_frame(p, engine, substeps=2)
    eng_big = B.default_engine(n, 1024, p)
    frame_big = B.make_frame(p, eng_big, substeps=2)
    s1, e1 = frame_small(state, jnp.float32(0.1))
    s2, e2 = frame_big(big, jnp.float32(0.1))
    assert not any(float(v) for v in e1.values()), e1
    assert not any(float(v) for v in e2.values()), e2
    n1, n2_ = int(s1.n), int(s2.n)
    assert n1 == n2_  # same RNG key stream -> identical divisions
    assert np.allclose(np.asarray(s1.X.x)[:n1], np.asarray(s2.X.x)[:n1],
                       atol=1e-5)


def test_next_tier_schedule():
    from yalla_tpu.models import branching as B
    assert B.next_tier(500, 500_000) == 4096
    assert B.next_tier(3000, 500_000) == 16384
    assert B.next_tier(200_000, 500_000) == B.tier_caps(500_000)[-1]
    # never exceeds the final pad, even when n is near n_max
    assert B.next_tier(499_999, 500_000) == B.tier_caps(500_000)[-1]
