"""Pallas TPU kernel for the dense cube-lattice pair pass.

Drop-in replacement for ``lattice_xla.lattice_pairwise_resident`` (same
layout contract and returns).  Design notes, from round-1/2 measurements
on a v5e chip:

* The XLA formulation re-reads each z-slab from HBM for every one of the
  9 x (4C - 1) neighbour shifts (~30 GB/pass at 500k cells).  Here the slab
  (plus z halo) is DMA'd into VMEM once per grid step.
* The round-1 kernel was *rotation-bound*: aligning every (dz, dy, shift)
  window with dynamic lane rotations plus per-window sub-slicing moved ~8G
  elements per pass.  This kernel never slices along lanes: the j-side slab
  lives in a VMEM scratch that is rolled **in place by a static -1** per
  shift iteration, and the force is evaluated full-width with window
  validity folded into the pair distance.
* The kernel is VPU-op-bound, so per-lane work is trimmed aggressively:
  - **Channel liveness**: the force is traced once (jaxpr dependence
    analysis) to find which Pt fields are actually read through Xj / r --
    only those are stored and rolled j-side; i-only fields (polarity trig,
    reaction inputs) ride the cheap unrolled i-buffer.  Constant-zero
    outputs (e.g. a dF.ctype that is always 0) get no accumulator.
  - **Diagonal hoisting**: the self-pair (i == j) is evaluated once per
    slab from the i-buffer and *excluded* from the offset loop.  If the
    force supplies an ``offdiag`` attribute (same force without its i == j
    branch, cf. the reference's explicit early branch, branching.cu:64-78),
    the hot loop traces that instead.
  - **No occupancy channel**: empty slots carry ``x = X_SENTINEL`` (set before
    stacking), so the cutoff test excludes them for free; the garbage an
    empty *i*-lane accumulates about itself is discarded when results are
    gathered back to stable-id order (``lattice_unbuild`` / ``to_stable``
    read only live slots) and by the integrator's occupancy masking.
  - **Masks fold into dist**: x-window validity (and the s == 0 diagonal)
    poison the pair distance to the sentinel instead of masking every output; each
    accumulator then costs one fma (``out += val * cut`` with
    ``cut = dist < cube_size`` -- also the engine's cutoff contract,
    ref solvers.cuh:450).  Forces vanish past the cutoff by that same
    contract, so no separate per-output masking is needed.
  - **Hoisted y alignment**: the three dy windows are sublane rolls per
    channel hoisted out of the dz loop (dy == 0 is the identity); the dz
    windows are leading-axis slices, which are free.
  - Forces written in single-reciprocal form (see ``models/branching``)
    lower to mul/add-only Mosaic code.
* The per-point ids passed to ``pw_int``/``pw_friction`` are *slot* ids
  (synthetic, from lane arithmetic), not stable point ids: only ``i == j``
  / ``i != j`` semantics are guaranteed, which is what every reference
  force functor uses them for (ref solvers.cuh:27-35).

Layout contract matches the XLA path (``lattice_xla``): per-slot channels
viewed as ``[gs_z, gs_y, gs_x * C]``; cube id = cx + cy*gs + cz*gs^2
(ref solvers.cuh:349-365).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lattice_pairwise_pallas"]

# Empty-slot / out-of-window position poison.  Large enough that any
# sentinel-involved pair distance exceeds every cutoff (coordinates are
# bounded by gs/2 * cube_size << 1e4), small enough that force bodies
# evaluating polynomials of r at the sentinel stay finite in f32 (r^9
# would still be ~1e36 < f32 max); forces must merely be finite -- not
# zero -- at sentinel inputs, since invalid lanes are multiplied by a
# zero cut factor during accumulation.
X_SENTINEL = 1e4


def _interpret():
    return jax.default_backend() == "cpu"


from .common import split_force_output as _split_probe


def _extras_tables(layout, t_fields, with_ov, nz, ny, zb, yb,
                   cube_size, grid_size, block_cap):
    """Per-(z, y)-block sidecar tables for the overflow extras.

    Each extra is assigned to every block whose cube range intersects the
    extra's +-1-cube neighbourhood in z and y (at most 2 x 2 distinct
    blocks) -- exactly the blocks whose *interior* lattice cells can sit
    within one cube size of it.  Pairs are therefore counted once: a
    lattice cell j belongs to the interior of exactly one block, and the
    extra is tabled in that block iff j can be in range.

    Returns (ids [n_blocks, block_cap] int32 with E_cap = empty,
    channels [n_blocks * block_cap * K_t] flat f32 (SMEM scalar-prefetch
    layout; Mosaic broadcasts scalars natively where a one-lane VMEM vreg
    cannot reach both sublanes and lanes) with X_SENTINEL-poisoned x for
    empty entries, block_overflow scalar).
    """
    from .common import cube_coord, grid_dims
    _, g_y, g_z = grid_dims(grid_size)
    E, Eov, epid = layout.E, layout.Eov, layout.epid
    E_cap = epid.shape[0]
    n_pad = layout.slot_of.shape[0]
    n_blocks = nz * ny
    live = epid < n_pad

    cz = cube_coord(E.z, cube_size, g_z)
    cy = cube_coord(E.y, cube_size, g_y)
    z_lo = jnp.clip((cz - 1) // zb, 0, nz - 1)
    z_hi = jnp.clip((cz + 1) // zb, 0, nz - 1)
    y_lo = jnp.clip((cy - 1) // yb, 0, ny - 1)
    y_hi = jnp.clip((cy + 1) // yb, 0, ny - 1)

    eidx = jnp.arange(E_cap, dtype=jnp.int32)
    blocks, valids = [], []
    for a, zi in ((0, z_lo), (1, z_hi)):
        for b, yi in ((0, y_lo), (1, y_hi)):
            dup = jnp.zeros((E_cap,), bool)
            if a == 1:
                dup = dup | (z_hi == z_lo)
            if b == 1:
                dup = dup | (y_hi == y_lo)
            blocks.append(zi * ny + yi)
            valids.append(live & ~dup)
    bid = jnp.where(jnp.stack(valids), jnp.stack(blocks),
                    n_blocks).reshape(-1)            # [4 * E_cap]
    ex = jnp.tile(eidx, 4)

    # rank within block via sort + segment starts
    sbid, sex = jax.lax.sort((bid, ex), num_keys=1)
    iota = jnp.arange(bid.shape[0], dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool), sbid[1:] != sbid[:-1]])
    rank = iota - jax.lax.cummax(jnp.where(first, iota, 0))
    ok = (rank < block_cap) & (sbid < n_blocks)
    tbl_slot = jnp.where(ok, sbid * block_cap + rank,
                         n_blocks * block_cap)
    ids = jnp.full(n_blocks * block_cap, E_cap, jnp.int32) \
        .at[tbl_slot].set(sex, mode="drop", unique_indices=True) \
        .reshape(n_blocks, block_cap)
    block_overflow = jnp.sum((rank >= block_cap) & (sbid < n_blocks)) \
        .astype(jnp.float32)

    # channel table: gather the few extras' fields; empty entries keep a
    # sentinel x so both kernel evals see an out-of-cutoff partner
    leaves = jax.tree.leaves(E)
    pick = jnp.minimum(ids, E_cap - 1)
    present = ids < E_cap
    cols = []
    for k in t_fields:
        v = leaves[k][pick]
        if k == 0:
            v = jnp.where(present & live[pick], v, X_SENTINEL)
        cols.append(v)
    if with_ov:
        cols += [Eov.x[pick], Eov.y[pick], Eov.z[pick]]
    chan = jnp.stack(cols, axis=-1)        # [n_blocks, block_cap, K_t]
    return ids, chan.reshape(-1), block_overflow


def _var_key(v):
    return id(v)


def _is_var(a):
    return hasattr(a, "aval") and not hasattr(a, "val")  # Var, not Literal


def _dependence(closed_jaxpr):
    """(tainted_outputs, live_inputs) of a jaxpr: which outputs depend on
    any input, and which inputs feed any such output.  Call-like eqns are
    treated opaquely (all-to-all) -- conservative in both directions."""
    jaxpr = closed_jaxpr.jaxpr
    tainted = {_var_key(v) for v in jaxpr.invars}
    for eqn in jaxpr.eqns:
        if any(_is_var(a) and _var_key(a) in tainted for a in eqn.invars):
            tainted.update(_var_key(v) for v in eqn.outvars)
    out_tainted = [_is_var(v) and _var_key(v) in tainted
                   for v in jaxpr.outvars]

    live = {_var_key(v) for v, t in zip(jaxpr.outvars, out_tainted)
            if t and _is_var(v)}
    for eqn in reversed(jaxpr.eqns):
        if any(_var_key(v) in live for v in eqn.outvars):
            live.update(_var_key(a) for a in eqn.invars if _is_var(a))
    in_live = [_var_key(v) in live for v in jaxpr.invars]
    return out_tainted, in_live


# default y-block height (cube rows per Pallas grid block); 16 amortizes
# the per-block DMA/roll overheads while keeping useful empty-block
# granularity.  Overridable per call via ``y_block``.
DEFAULT_Y_BLOCK = 16


def lattice_pairwise_pallas(pw_int, pw_friction, layout, n, cube_size, *,
                            grid_size, capacity, z_block, y_block=None,
                            extras_block_cap=16, grid_z=None, n_pad=None,
                            z_halo=None, x_split=1):
    """Pairwise sums in lattice layout on the TPU VPU (see module docs).

    Returns (F (dF-typed tree), sum_friction, sum_v 3-tuple, aux dict),
    all ``[n_slots]`` -- identical to ``lattice_pairwise_resident``.
    If the layout carries overflow extras (``lattice_build`` with
    ``extras_cap > 0``), a fifth element is returned: the same 4-tuple in
    ``[extras_cap]`` order for the extras themselves (their self/diagonal
    and extras-extras pairs included), so the lattice capacity can sit at
    the TYPICAL cube occupancy while the worst cubes spill exactly.

    The Pallas grid is blocked in BOTH z and y (``z_block`` x ``y_block``
    cube blocks, full x rows).  The j-side slab is DMA'd *with its y and z
    halo rows* from a padded HBM array, so the three dy windows are free
    leading-axis slices (the round-2 kernel spent ~10% of issue slots on
    per-shift circular y-rolls plus edge masking).  Blocks whose i-side
    contains no occupied slot are skipped entirely: the force/offset loop
    never runs for the empty corners of the grid box (a settled 500k
    tissue ball occupies ~40% of its bounding lattice; empty blocks still
    contribute their halo rows to neighbours via the j-side DMA, so the
    skip is physics-exact).

    Multi-chip z-slab mode (``parallel/lattice_spmd.py``): ``grid_z`` is
    the LOCAL z extent (< grid_size) and ``z_halo`` supplies the
    ppermute-exchanged neighbour planes as
    ``(lo_leaves, hi_leaves, lo_ov, hi_ov, lo_occ, hi_occ)`` -- leaf lists
    / Float3 planes / occupancy planes, each ``[gs * W]``-shaped.  The
    j-side array is then built with REAL halo planes at its z ends instead
    of the single-chip sentinel padding, so multi-chip inherits the
    single-chip kernel unchanged.  ``n_pad`` overrides the empty-slot
    sentinel when no ``slot_of`` is at hand (inside shard_map).
    """
    from .common import grid_dims
    gx, gy, gz_full = grid_dims(grid_size)
    C = capacity
    gz = grid_z if grid_z is not None else gz_full
    n_slots = layout.pid.shape[0]
    if n_pad is None:
        n_pad = layout.slot_of.shape[0]
    W = gx * C
    assert W % 128 == 0, "gx * capacity must be a multiple of 128 lanes"
    zb = z_block
    assert gz % zb == 0
    nz = gz // zb
    # y blocks must be multiples of 8: HBM DMA slices are 8-aligned in the
    # sublane dim, so blocks start on 8-row boundaries
    if y_block is None:
        y_block = DEFAULT_Y_BLOCK
    yb = max((y_block // 8) * 8, 8)
    while gy % yb:
        yb -= 8
    assert yb >= 8 and gy % yb == 0, \
        "grid y extent must be a multiple of 8 for the Pallas kernel"
    ny = gy // yb
    # block-local slot ids ride f32 lanes; they (plus the largest window
    # offset) must stay exactly representable
    xs_k = x_split
    assert (zb + 2) * (yb + 2) * W + (xs_k + 1) * C < 2 ** 24, \
        "z_block * y_block * gs * C too large for exact f32 slot ids"
    # flat x shifts cover (thin-)cube offsets -k..+k: a point at slot
    # 0..C-1 of its cube reaches slots up to (k + 1) * C - 1 lanes away
    smax = (xs_k + 1) * C - 1
    n_shifts = 2 * smax + 1     # isotropic (k = 1): the familiar 4C - 1

    pw_off = getattr(pw_int, "offdiag", None) or pw_int
    field_leaves, field_tree = jax.tree.flatten(layout.T)
    nf = len(field_leaves)

    def unflatten_pt(leaves):
        return jax.tree.unflatten(field_tree, leaves)

    # ---- trace-time structure probe + dependence analysis -----------------
    shape = (zb, yb, W)
    ex = jnp.zeros((8, 128), jnp.float32)

    def f_off(xi, xj, ids):
        Xi, Xj = unflatten_pt(xi), unflatten_pt(xj)
        i, j = ids
        r = Xi - Xj
        dist = jnp.sqrt(r.x * r.x + r.y * r.y + r.z * r.z)
        dF, aux = _split_probe(pw_off(Xi, r, dist, i, j))
        fr = pw_friction(Xi, r, dist, i, j)
        return (jax.tree.leaves(dF) + [jnp.broadcast_to(fr, dist.shape)]
                + list(aux.values()))

    def f_diag(xi, i):
        Xi = unflatten_pt(xi)
        zero = jnp.zeros_like(Xi.x)
        r = jax.tree.map(lambda _: zero, Xi)
        dF, aux = _split_probe(pw_int(Xi, r, zero, i, i))
        fr = pw_friction(Xi, r, zero, i, i)
        return (jax.tree.leaves(dF) + [jnp.broadcast_to(fr, zero.shape)]
                + list(aux.values()))

    # structure: from the full force (offdiag must match it by contract)
    dF_probe, aux_probe = _split_probe(
        pw_int(unflatten_pt([ex] * nf), unflatten_pt([ex] * nf),
               jnp.ones_like(ex), ex, ex))
    dF_leaves_probe, dF_tree = jax.tree.flatten(dF_probe)
    n_dF = len(dF_leaves_probe)
    aux_keys = list(aux_probe.keys())
    n_out = n_dF + 1 + len(aux_keys)      # dF.., fr, aux..

    out_t_off, in_live_off = _dependence(
        jax.make_jaxpr(f_off)([ex] * nf, [ex] * nf, (ex, ex)))
    out_t_diag, in_live_diag = _dependence(
        jax.make_jaxpr(f_diag)([ex] * nf, ex))
    xi_need = [in_live_off[k] or in_live_off[nf + k] or in_live_diag[k]
               for k in range(nf)]
    xj_need = [in_live_off[nf + k] for k in range(nf)]
    for k in range(3):
        # x, y, z feed the kernel's own dist/cutoff mask regardless of
        # what the force reads (make_pt puts them first)
        xi_need[k] = xj_need[k] = True

    # constant outputs: prune only if the constant is zero (evaluated
    # outside the ambient trace -- forces are static functions of their
    # arguments by the heun_step contract)
    with jax.ensure_compile_time_eval():
        zeros_in = [jnp.zeros((1, 1), jnp.float32)] * nf
        zz = jnp.zeros((1, 1), jnp.float32)
        const_off = [np.asarray(v)
                     for v in f_off(zeros_in, zeros_in, (zz, zz))]
        const_diag = [np.asarray(v) for v in f_diag(zeros_in, zz)]
    live_off = [t or c.any() for t, c in zip(out_t_off, const_off)]
    live_diag = [t or c.any() for t, c in zip(out_t_diag, const_diag)]
    fr_off, fr_diag = live_off[n_dF], live_diag[n_dF]
    out_need = [a or b for a, b in zip(live_off, live_diag)]

    # ---- channel and accumulator layout -----------------------------------
    occ = layout.pid < n_pad
    # empty slots: position sentinel instead of an occupancy channel
    leaves_p = ([jnp.where(occ, field_leaves[0], X_SENTINEL)]
                + field_leaves[1:])
    ovs = [layout.Tov.x, layout.Tov.y, layout.Tov.z]

    xi_fields = [k for k in range(nf) if xi_need[k]]
    xj_fields = [k for k in range(nf) if xj_need[k]]
    xi_channels = [leaves_p[k] for k in xi_fields] \
        + (ovs if fr_diag else [])
    rj_channels = [leaves_p[k] for k in xj_fields] \
        + (ovs if fr_off else [])
    K_i, K_j = len(xi_channels), len(rj_channels)
    XI_OV, RJ_OV = len(xi_fields), len(xj_fields)

    # accumulators: live dF leaves, sum_f, sum_v (if any friction), live aux
    acc_of_out = {}
    M = 0
    for o in range(n_out):
        if o == n_dF:   # friction slot -> sum_f + 3 sum_v accumulators
            continue
        if out_need[o]:
            acc_of_out[o] = M
            M += 1
    have_fr = fr_off or fr_diag
    SUMF = SUMV = None
    if have_fr:
        SUMF, SUMV = M, M + 1
        M += 4

    def stack_i(chs):
        # i-side needs no halo: blocks slice it exactly
        return jnp.stack([c.reshape(gz, gy, W) for c in chs])

    def stack_j(chs, halos=None):
        # one z-halo plane each side plus EIGHT y-halo rows each side: HBM
        # slices must be 8-aligned in the sublane (y) dim, so the j-block
        # DMA fetches an aligned 8 + yb + 8 row window and the kernel
        # addresses the real +-1 halo at static offset 7.  The position
        # sentinel in the pad poisons out-of-grid partners.  In z-slab
        # mode the z pads carry the EXCHANGED neighbour planes instead.
        outs = []
        for idx, c in enumerate(chs):
            fill = X_SENTINEL if idx == 0 else 0.0
            a = c.reshape(gz, gy, W)
            if halos is not None:
                lo, hi = halos[idx]
                a = jnp.concatenate([lo.reshape(1, gy, W), a,
                                     hi.reshape(1, gy, W)], axis=0)
                a = jnp.pad(a, ((0, 0), (8, 8), (0, 0)),
                            constant_values=fill)
            else:
                a = jnp.pad(a, ((1, 1), (8, 8), (0, 0)),
                            constant_values=fill)
            outs.append(a)
        return jnp.stack(outs)

    A_i = stack_i(xi_channels)        # [K_i, gz, gy, W]
    if z_halo is not None:
        lo_l, hi_l, lo_ov3, hi_ov3, lo_occ, hi_occ = z_halo
        lo_p = [jnp.where(lo_occ, lo_l[0], X_SENTINEL)] + list(lo_l[1:])
        hi_p = [jnp.where(hi_occ, hi_l[0], X_SENTINEL)] + list(hi_l[1:])
        halos = [(lo_p[k], hi_p[k]) for k in xj_fields] \
            + ([(lo_ov3[c], hi_ov3[c]) for c in range(3)]
               if fr_off else [])
        A_j = stack_j(rj_channels, halos)  # [K_j, gz+2, gs+16, W]
    else:
        A_j = stack_j(rj_channels)        # [K_j, gz+2, gs+16, W]

    # ---- overflow-extras sidecar tables -----------------------------------
    has_extras = getattr(layout, "E", None) is not None
    E_b = max((extras_block_cap // 8) * 8, 8)
    t_fields = [k for k in range(nf) if xi_need[k] or xj_need[k]]
    tcol = {k: i for i, k in enumerate(t_fields)}
    T_OV = len(t_fields)
    if has_extras:
        ids_tbl, chan_tbl, block_over = _extras_tables(
            layout, t_fields, have_fr, nz, ny, zb, yb,
            cube_size, grid_size, E_b)
    else:
        chan_tbl = jnp.zeros((nz * ny, E_b, 128), jnp.float32)

    # per-block i-side occupancy: blocks with no live slot skip the whole
    # offset loop (their sentinel i-lanes would only accumulate garbage
    # that lattice_unbuild discards anyway, and their j-side halo
    # contributions to live neighbours ride A_j regardless)
    act = occ.reshape(nz, zb, ny, yb * W).any(axis=(1, 3))
    act = act.reshape(-1).astype(jnp.int32)
    n_blocks = nz * ny
    # next-active-block table for DMA double buffering: nxtp[0] is the
    # FIRST active block; nxtp[b + 1] the next active block strictly
    # after b (n_blocks = none).  Each active block prefetches its
    # successor's i/j windows into the other buffer while it computes,
    # so the per-block HBM fetch waits (~5-15 us x ~n_blocks/pass,
    # ROADMAP round-3 item 2) overlap the offset loop instead of
    # serializing with it.
    idxs = jnp.arange(n_blocks, dtype=jnp.int32)
    nxt_ge = jax.lax.cummin(jnp.where(act > 0, idxs, n_blocks),
                            reverse=True)      # next active >= b
    nxtp = jnp.concatenate([nxt_ge[:1], nxt_ge[1:],
                            jnp.full((1,), n_blocks, jnp.int32)])

    def kernel(scal_ref, act_ref, nxtp_ref, *refs):
        if has_extras:
            (et_sref, Ai_hbm, Aj_hbm, out_ref, out2_ref,
             xi_ref, rj_ref, rr_ref, cnt_ref, sems) = refs
        else:
            (Ai_hbm, Aj_hbm, out_ref, xi_ref, rj_ref, rr_ref,
             cnt_ref, sems) = refs
        zi = pl.program_id(0)
        yi = pl.program_id(1)

        def start_dma(blk, slot):
            z0 = (blk // ny) * zb
            y0 = (blk % ny) * yb
            pltpu.make_async_copy(
                Ai_hbm.at[:, pl.ds(z0, zb), pl.ds(y0, yb)],
                xi_ref.at[slot], sems.at[slot, 0]).start()
            pltpu.make_async_copy(
                Aj_hbm.at[:, pl.ds(z0, zb + 2), pl.ds(y0, yb + 16)],
                rj_ref.at[slot], sems.at[slot, 1]).start()

        @pl.when((zi == 0) & (yi == 0))
        def _first_grid_step():
            cnt_ref[0] = 0

            @pl.when(nxtp_ref[0] < n_blocks)
            def _():
                start_dma(nxtp_ref[0], 0)

        out_ref[...] = jnp.zeros((M,) + shape, jnp.float32)
        if has_extras:
            out2_ref[...] = jnp.zeros((E_b, 128), jnp.float32)

        @pl.when(act_ref[zi * ny + yi] > 0)
        def _active_block():
            csize = scal_ref[0]
            slot = jax.lax.rem(cnt_ref[0], 2)
            cnt_ref[0] = cnt_ref[0] + 1
            nb = nxtp_ref[zi * ny + yi + 1]

            @pl.when(nb < n_blocks)
            def _prefetch_next():
                start_dma(nb, 1 - slot)

            # wait for THIS block's windows (started by the previous
            # active block, or by the first-grid-step warmup)
            pltpu.make_async_copy(
                Ai_hbm.at[:, pl.ds(zi * zb, zb), pl.ds(yi * yb, yb)],
                xi_ref.at[slot], sems.at[slot, 0]).wait()
            pltpu.make_async_copy(
                Aj_hbm.at[:, pl.ds(zi * zb, zb + 2),
                          pl.ds(yi * yb, yb + 16)],
                rj_ref.at[slot], sems.at[slot, 1]).wait()

            zero = jnp.zeros(shape, jnp.float32)
            Xi_leaves = [xi_ref[slot, xi_fields.index(k)] if xi_need[k]
                         else zero for k in range(nf)]
            Xi = unflatten_pt(Xi_leaves)
            xi_leaf = Xi_leaves.__getitem__

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
            yrow = jax.lax.broadcasted_iota(jnp.int32, (1, yb, 1), 1)
            zrow = jax.lax.broadcasted_iota(jnp.int32, (zb, 1, 1), 0)
            # BLOCK-LOCAL slot id of i: the contract guarantees only
            # i == j / i != j semantics (module docs), so the id needs to
            # be exact and injective only over one block plus the offset
            # range -- local ids stay far below 2^24 for any grid size,
            # where a global ((zi*zb+z)*gs+y)*W+x id would lose f32
            # exactness past gs^3*C = 2^24 slots and silently alias
            # i == j for distinct pairs
            i_ids = (((zrow + 1) * (yb + 2) + (yrow + 1)) * W
                     + lane).astype(jnp.float32)

            def accumulate(outs, cut, ovj):
                # cut is None (self pairs, always in range) or an f32 0/1
                # mask folded in as one fma per accumulator
                for o, acc in acc_of_out.items():
                    v = jnp.broadcast_to(outs[o], shape)
                    out_ref[acc] += v if cut is None else v * cut
                if have_fr:
                    fr = jnp.broadcast_to(outs[n_dF], shape)
                    if cut is not None:
                        fr = fr * cut
                    out_ref[SUMF] += fr
                    for c in range(3):
                        out_ref[SUMV + c] += fr * ovj[c]

            def call_force(fn, r, dist, j_ids):
                # r prebuilt with live-field subtractions only (dead fields
                # share one zero buffer -- no wasted full-lane subs)
                dF, aux = _split_probe(fn(Xi, r, dist, i_ids, j_ids))
                fr = pw_friction(Xi, r, dist, i_ids, j_ids)
                return (jax.tree.leaves(dF) + [fr]
                        + [aux[k] for k in aux_keys])

            # --- self pairs: once per block, off the hot loop --------------
            if any(live_diag):
                r0 = unflatten_pt([zero] * nf)
                outs = call_force(pw_int, r0, zero, i_ids)
                ov_i = ([xi_ref[slot, XI_OV + c] for c in range(3)]
                        if fr_diag else (zero, zero, zero))
                accumulate(outs, None, ov_i)

            # --- overflow extras (before the pre-roll: uses the unshifted
            # centre window).  Each tabled extra is evaluated BOTH ways
            # against this block's interior lattice cells: as the j-partner
            # of every lattice lane (accumulated into out_ref like any
            # offset window) and as the i-point receiving force from them
            # (reduced to per-extra scalars in out2).  Interior-only j's
            # guarantee each (cell, extra) pair is counted exactly once
            # across the <= 4 blocks an extra is tabled in.
            if has_extras:
                def jcen(c):
                    return rj_ref[slot, c, 1:1 + zb, 8:8 + yb]

                lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                K_t = len(t_fields) + (3 if have_fr else 0)
                base = (zi * ny + yi) * E_b * K_t

                for e in range(E_b):
                    # SMEM scalar reads: scalar-vector broadcasts are the
                    # one form Mosaic supports natively (a one-lane VMEM
                    # vreg cannot broadcast to both sublanes and lanes)
                    def ecol(c):
                        return et_sref[base + e * K_t + c]

                    xe = {k: ecol(tcol[k]) for k in t_fields}
                    r1_leaves = [
                        (jcen(xj_fields.index(k)) - xe[k])
                        if xj_need[k] else zero for k in range(nf)]
                    r1 = unflatten_pt(r1_leaves)
                    d1 = jnp.sqrt(r1.x * r1.x + r1.y * r1.y
                                  + r1.z * r1.z)
                    cut_e = (d1 < csize).astype(jnp.float32)
                    e_id = jnp.float32(-(e + 1))

                    # lattice i <- extra j
                    outs1 = call_force(pw_off, r1, d1, e_id)
                    ovj1 = tuple(ecol(T_OV + c) for c in range(3)) \
                        if have_fr else (zero, zero, zero)
                    accumulate(outs1, cut_e, ovj1)

                    # extra i <- lattice j, reduced to one (1, 128) row
                    # per extra: lane m of the row carries accumulator m
                    # (Mosaic cannot store scalars to VMEM)
                    Xe_pt = unflatten_pt(
                        [xe[k] if k in tcol else 0.0 for k in range(nf)])
                    r2 = unflatten_pt(
                        [-r1_leaves[k] if xj_need[k] else zero
                         for k in range(nf)])
                    dF2, aux2 = _split_probe(
                        pw_off(Xe_pt, r2, d1, e_id, i_ids))
                    outs2 = (jax.tree.leaves(dF2)
                             + [pw_friction(Xe_pt, r2, d1, e_id, i_ids)]
                             + [aux2[k] for k in aux_keys])
                    row = jnp.zeros((1, 128), jnp.float32)
                    for o, acc in acc_of_out.items():
                        s = jnp.sum(jnp.broadcast_to(outs2[o], shape)
                                    * cut_e)
                        row = row + jnp.where(lane128 == acc, s, 0.0)
                    if have_fr:
                        fr2 = jnp.broadcast_to(outs2[n_dF], shape) * cut_e
                        row = row + jnp.where(lane128 == SUMF,
                                              jnp.sum(fr2), 0.0)
                        if fr_off:
                            for c in range(3):
                                row = row + jnp.where(
                                    lane128 == SUMV + c,
                                    jnp.sum(fr2 * jcen(RJ_OV + c)), 0.0)
                    out2_ref[e:e + 1, :] = row

            # --- 9 x (4C - 1) offset loop ----------------------------------
            # j-block pre-rolled so iteration t sees shift s = t - (2C - 1):
            # rolled[l] = orig[l + s].  The (dz, dy) windows are free static
            # slices of the halo'd j-block -- no rolls, no edge masks.
            # The roll operates on a NARROW scratch holding only the live
            # yb + 2 halo rows: the 8-aligned DMA fetch window carries
            # yb + 16 rows, and rolling its 14 dead alignment rows 4C - 1
            # times per block cost ~25% of the total roll issue slots
            rr_ref[...] = pltpu.roll(
                rj_ref[slot, :, :, 7:7 + yb + 2], smax, axis=3)

            def body(t, _):
                s = t - smax
                q = lane + s                   # partner's flat x position
                off = (xs_k + 3) * C           # keep // args non-negative
                dcube = (q + off) // C - (lane + off) // C
                valid_x = (q >= 0) & (q < W) & (dcube >= -xs_k) & (dcube <= xs_k)

                for dz in (0, 1, 2):
                    for dy in (0, 1, 2):
                        def jsl(c):
                            # rr_ref rows are the real +-1 y halo window
                            return rr_ref[c, dz:dz + zb, dy:dy + yb]

                        r = unflatten_pt(
                            [(xi_leaf(k) - jsl(xj_fields.index(k)))
                             if xj_need[k] else zero for k in range(nf)])
                        dist = jnp.sqrt(r.x * r.x + r.y * r.y + r.z * r.z)
                        # fold x-window validity (and the hoisted diagonal)
                        # into dist; the position sentinel already poisons
                        # empty slots and the z/y halo rows
                        if dy == 1 and dz == 1:
                            dist = jnp.where(valid_x & (s != 0), dist,
                                             X_SENTINEL)
                        else:
                            dist = jnp.where(valid_x, dist, X_SENTINEL)
                        cut = (dist < csize).astype(jnp.float32)

                        j_ids = i_ids + jnp.float32(
                            ((dz - 1) * (yb + 2) + (dy - 1)) * W) \
                            + s.astype(jnp.float32)
                        outs = call_force(pw_off, r, dist, j_ids)
                        ovj = ([jsl(RJ_OV + c) for c in range(3)]
                               if fr_off else (zero, zero, zero))
                        accumulate(outs, cut, ovj)

                # advance to the next shift: rolled[l] <- rolled[l + 1]
                rr_ref[...] = pltpu.roll(rr_ref[...], W - 1, axis=3)
                return 0

            jax.lax.fori_loop(0, n_shifts, body, 0)

    pair_lanes = nz * ny * n_shifts * 9 * zb * yb * W
    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY)]
    out_specs = [pl.BlockSpec((M, zb, yb, W),
                              lambda zi, yi, *_: (0, zi, yi, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((M, gz, gy, W), jnp.float32)]
    scratch = [pltpu.VMEM((2, K_i, zb, yb, W), jnp.float32),
               pltpu.VMEM((2, K_j, zb + 2, yb + 16, W), jnp.float32),
               pltpu.VMEM((K_j, zb + 2, yb + 2, W), jnp.float32),
               pltpu.SMEM((1,), jnp.int32)]
    prefetch = [jnp.asarray([cube_size], jnp.float32), act, nxtp]
    if has_extras:
        # the extras channel table rides SMEM as a third prefetch scalar
        # array (see _extras_tables)
        prefetch.append(chan_tbl)
        out_specs.append(pl.BlockSpec(
            (None, E_b, 128), lambda zi, yi, *_: (zi * ny + yi, 0, 0),
            memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((nz * ny, E_b, 128), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2, 2)))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=(nz, ny),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=pair_lanes * 40, transcendentals=pair_lanes,
            bytes_accessed=(K_i + K_j + M) * gz * gy * W * 4),
        interpret=_interpret(),
    )(*prefetch, A_i, A_j)

    flat = out[0].reshape(M, n_slots)

    def unpack(flat_rows, zeros_like):
        def out_slot(o):
            return flat_rows[acc_of_out[o]] if o in acc_of_out \
                else zeros_like
        F = jax.tree.unflatten(dF_tree, [out_slot(o) for o in range(n_dF)])
        sum_f = flat_rows[SUMF] if have_fr else zeros_like
        sum_v = tuple(flat_rows[SUMV + c] for c in range(3)) if have_fr \
            else (zeros_like,) * 3
        aux = {k: out_slot(n_dF + 1 + i) for i, k in enumerate(aux_keys)}
        return F, sum_f, sum_v, aux

    F, sum_f, sum_v, aux = unpack(flat, jnp.zeros((n_slots,), jnp.float32))
    if not has_extras:
        return F, sum_f, sum_v, aux

    # ---- merge the per-block extra reductions + extras-extras pairs ------
    E_cap = layout.epid.shape[0]
    ids_flat = ids_tbl.reshape(-1)
    o2 = out[1].reshape(-1, 128)
    esums = jnp.zeros((E_cap + 1, 128), jnp.float32) \
        .at[ids_flat].add(o2)[:E_cap]           # empty entries -> bucket -1
    Fe, sum_fe, sum_ve, aux_e = unpack(
        [esums[:, m] for m in range(M)], jnp.zeros((E_cap,), jnp.float32))

    # extras-extras pairs (incl. the i == j diagonal/reaction terms, which
    # the kernel's hoisted self-pair only covers for lattice slots)
    from .common import evaluate_pairs
    live = layout.epid < n_pad
    ids_e = jnp.arange(E_cap, dtype=jnp.int32)
    Xi_e = jax.tree.map(lambda a: a[:, None], layout.E)
    Xj_e = jax.tree.map(lambda a: a[None, :], layout.E)
    ov_e = (layout.Eov.x[None, :], layout.Eov.y[None, :],
            layout.Eov.z[None, :])
    F2, sf2, sv2, aux2 = evaluate_pairs(
        pw_int, pw_friction, Xi_e, Xj_e, ov_e,
        ids_e[:, None], ids_e[None, :],
        live[:, None] & live[None, :], sum_axes=(1,), cutoff=cube_size)
    Fe = jax.tree.map(jnp.add, Fe, F2)
    sum_fe = sum_fe + sf2
    sum_ve = tuple(a + b for a, b in zip(sum_ve, sv2))
    aux_e = {k: aux_e[k] + aux2.get(k, 0.0) for k in aux_e}
    aux_e["__err_extras_block"] = block_over
    return F, sum_f, sum_v, aux, (Fe, sum_fe, sum_ve, aux_e)
