"""Butterfly pour kernel (ops/lattice_pour.py) vs the XLA scatter pour.

The conflict-free stage schedules (LSB-first bit-moves for the downward
compaction, MSB-first for the upward expansion) are load-bearing; these
tests pin them with exact equality against the scatter placement.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yalla_tpu.ops.lattice_pour import (DST_SENTINEL, pour_pallas,
                                        pour_supported)


def _case(n_pad, gs, C, n, seed, clustered=False):
    rng = np.random.default_rng(seed)
    n_cubes = gs ** 3
    n_slots = n_cubes * C
    if clustered:
        # heavy per-cube occupancy -> many out-of-capacity (dropped) cells
        cid = np.sort(rng.choice(n_cubes // 7, n).astype(np.int64) * 7)
    else:
        cid = np.sort(rng.choice(n_cubes, n).astype(np.int64))
    rank = np.zeros(n, np.int64)
    for i in range(1, n):
        rank[i] = rank[i - 1] + 1 if cid[i] == cid[i - 1] else 0
    keep = rank < C
    dst = np.where(keep, cid * C + rank, -1)
    K = 5  # 4 data channels + dst
    S = rng.random((K, n_pad), np.float32)
    S[K - 1, :n] = np.where(dst >= 0, dst, DST_SENTINEL).astype(np.float32)
    S[K - 1, n:] = DST_SENTINEL

    # oracle: scatter placement
    oracle = np.zeros((K - 1, n_slots), np.float32)
    olive = np.zeros(n_slots, np.float32)
    for i in range(n):
        if dst[i] >= 0:
            oracle[:, dst[i]] = S[:K - 1, i]
            olive[dst[i]] = 1.0

    # row starts (first sorted position per (z, y) row of gs cubes)
    n_rows = gs * gs
    row_starts = np.searchsorted(cid, np.arange(n_rows + 1) * gs
                                 ).astype(np.int32)
    return S, row_starts, oracle, olive


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("clustered", [False, True])
def test_pour_matches_scatter(seed, clustered):
    n_pad, gs, C = 8192, 16, 8
    assert pour_supported(n_pad, gs, C)
    n = 6000
    S, row_starts, oracle, olive = _case(n_pad, gs, C, n, seed, clustered)
    out, live, n_unrouted = pour_pallas(
        jnp.asarray(S), jnp.asarray(row_starts), n_pad, gs, C)
    assert int(n_unrouted) == 0
    np.testing.assert_array_equal(np.asarray(live), olive)
    np.testing.assert_array_equal(np.asarray(out), oracle)


def test_pour_empty_and_full_rows():
    n_pad, gs, C = 8192, 16, 8
    rng = np.random.default_rng(3)
    n_cubes = gs ** 3
    # everything piled into one single row of cubes (row 17), plus an
    # exactly-full row (row 100 at full capacity)
    cid = np.concatenate([
        np.repeat(np.arange(17 * gs, 17 * gs + gs), C // 2),
        np.repeat(np.arange(100 * gs, 100 * gs + gs), C)])
    cid = np.sort(cid)
    n = len(cid)
    rank = np.zeros(n, np.int64)
    for i in range(1, n):
        rank[i] = rank[i - 1] + 1 if cid[i] == cid[i - 1] else 0
    dst = cid * C + rank
    K = 3
    S = rng.random((K, n_pad), np.float32)
    S[K - 1, :n] = dst.astype(np.float32)
    S[K - 1, n:] = DST_SENTINEL
    row_starts = np.searchsorted(cid, np.arange(gs * gs + 1) * gs
                                 ).astype(np.int32)
    out, live, n_unrouted = pour_pallas(
        jnp.asarray(S), jnp.asarray(row_starts), n_pad, gs, C)
    assert int(n_unrouted) == 0
    out = np.asarray(out)
    live = np.asarray(live)
    assert live.sum() == n
    for i in range(n):
        np.testing.assert_array_equal(out[:, dst[i]], S[:K - 1, i])


def test_pour_unroutable_counted():
    """A row whose run exceeds the stage budget reports unrouted cells
    rather than placing them wrong or dropping silently."""
    n_pad, gs, C = 8192, 16, 8
    n_cubes = gs ** 3
    # spill_cap=0 shrinks the phase-1 budget; pile > 1024 junk (dropped)
    # entries before a placed cell inside one block's window
    n_junk = 1600
    cid = np.concatenate([np.full(n_junk + 1, 5)]).astype(np.int64)
    n = len(cid)
    dst = np.full(n, -1, np.int64)
    dst[0] = 5 * C  # rank 0 placed; the rest overflow capacity
    # a far-away later cell whose own placement is fine
    K = 2
    S = np.zeros((K, n_pad), np.float32)
    S[0, :n] = np.arange(n)
    S[K - 1, :n] = np.where(dst >= 0, dst, DST_SENTINEL).astype(np.float32)
    S[K - 1, n:] = DST_SENTINEL
    row_starts = np.searchsorted(cid, np.arange(gs * gs + 1) * gs
                                 ).astype(np.int32)
    out, live, n_unrouted = pour_pallas(
        jnp.asarray(S), jnp.asarray(row_starts), n_pad, gs, C,
        spill_cap=0)
    # the placed cell at rank 0 sits at window position 0 (aligned run
    # start) so it routes; nothing may be misplaced either way
    out = np.asarray(out)
    placed = np.flatnonzero(np.asarray(live))
    for slot in placed:
        src = np.flatnonzero(S[K - 1] == slot)
        assert len(src) == 1 and out[0, slot] == S[0, src[0]]


def test_lattice_build_pallas_pour_equal():
    """lattice_build(pallas_pour=True) == the scatter build, bit-exact."""
    from yalla_tpu.dtypes import Float3, make_pt
    from yalla_tpu.ops.lattice_xla import lattice_build

    Cell = make_pt("PCell", "u")
    rng = np.random.default_rng(7)
    n_pad, gs, C = 8192, 16, 8
    n = 7000
    pos = rng.uniform(-7, 7, (n_pad, 3)).astype(np.float32)
    X = Cell(x=jnp.asarray(pos[:, 0]), y=jnp.asarray(pos[:, 1]),
             z=jnp.asarray(pos[:, 2]),
             u=jnp.asarray(rng.random(n_pad), jnp.float32))
    ov = Float3(x=jnp.asarray(rng.random(n_pad), jnp.float32),
                y=jnp.asarray(rng.random(n_pad), jnp.float32),
                z=jnp.asarray(rng.random(n_pad), jnp.float32))
    for extras_cap in (0, 512):
        a = lattice_build(X, ov, jnp.int32(n), 1.0, gs, C, extras_cap)
        b = lattice_build(X, ov, jnp.int32(n), 1.0, gs, C, extras_cap,
                          pallas_pour=True)
        for la, lb, name in [(a.T, b.T, "T"), (a.Tov, b.Tov, "Tov")]:
            for fa, fb in zip(jax.tree.leaves(la), jax.tree.leaves(lb)):
                np.testing.assert_array_equal(np.asarray(fa),
                                              np.asarray(fb), err_msg=name)
        np.testing.assert_array_equal(np.asarray(a.pid), np.asarray(b.pid))
        np.testing.assert_array_equal(np.asarray(a.slot_of),
                                      np.asarray(b.slot_of))
        assert int(a.n_dropped) == int(b.n_dropped)
        if extras_cap:
            np.testing.assert_array_equal(np.asarray(a.epid),
                                          np.asarray(b.epid))
