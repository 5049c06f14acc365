"""Slot-plane Pallas kernel for the dense cube-lattice pair pass.

Drop-in equivalent of ``lattice_pallas.lattice_pairwise_pallas`` (same
arguments, same returns, same physics) with a lane layout that removes
the flat kernel's structural waste.

The flat layout puts a whole x-row of cubes in one lane row
(``lane = cube_x * C + slot``), so covering cube offsets dcube in
{-1, 0, 1} takes ``4C - 1`` single-lane shifts, of which each lane pair
is valid in only ``3C`` -- a ~25% masked-out tax -- and every shift
re-rolls the j-buffer.

Here a lane row holds ``P = 128 // gx`` *slot planes* of the same x-row
(``lane = h * gx + cube_x``, slot = pr * P + h, one row per
``pr < R = C / P``).  A cube offset is then EXACTLY a +-1 lane shift,
and slot pairing becomes a (pr_i, pr_j, dh) row/rotation choice:

* j-buffer rolls: ``3P`` static roll variants per block (vs ``4C - 1``),
  each serving all ``R^2`` row pairs x 9 (dz, dy) windows;
* lane-evals per (z, y) window: ``3 P (C/P)^2 * 128 = 3 C^2 * 128 / P``
  vs the flat ``(4C - 1) * C * gx`` -- a ``3C / (4C - 1)`` ~= 0.75 ratio;
* the dcube-validity arithmetic (q, dcube, window folds) reduces to one
  cube-edge mask per dcube, hoisted out of the pair loop.

Measured reality (benchmarks/diag_planes_pass.py, 500k bench shapes):
despite the ~25% lane-eval saving the kernel BODY runs ~68 ms/pass vs
the flat kernel's ~45 -- the (variant, pj) loop nest pays more in
dynamic-indexed j-slices and R-deep accumulator carries than the lane
saving returns -- so dispatch is gated behind ``pre_planed`` (state
kept in planes order by the caller; ``lattice_xla.PLANES_CHUNKS``)
while the race is open.  Requirements: ``128 % gx == 0`` and
``C % (128 // gx) == 0``; the flat kernel serves all other shapes
(``lattice_pallas.lattice_pairwise_pallas`` dispatches here).

Everything else -- channel liveness pruning, diagonal hoisting, the
position sentinel, dist-folded masks, overflow-extras sidecar tables,
empty-block skipping, z-slab halo mode -- matches the flat kernel
(see ``lattice_pallas`` module docs; ref contract solvers.cuh:15-53,
cutoff semantics solvers.cuh:450).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import split_force_output as _split_probe
from .lattice_pallas import (DEFAULT_Y_BLOCK, X_SENTINEL, _dependence,
                             _extras_tables, _interpret)

__all__ = ["lattice_pairwise_planes", "planes_supported"]

# experiment toggle (benchmarks/diag_planes_pass.py): unroll the pj loop
# into static slices instead of a fori with dynamic leading-dim indexing
UNROLL_PJ = False


def planes_supported(grid_size, capacity):
    """Shapes the slot-plane layout can serve: x-row fits 128 lanes an
    integral number of times and the capacity splits into P packs."""
    from .common import grid_dims
    gx, _, _ = grid_dims(grid_size)
    if gx > 128 or 128 % gx:
        return False
    return capacity % (128 // gx) == 0


def _to_planes(a, gz, gy, gx, R, P):
    """[gz * gy * gx * C] slot-major channel -> (R, gz, gy, 128) planes
    (slot = pr * P + h, lane = h * gx + cx)."""
    return a.reshape(gz, gy, gx, R, P).transpose(3, 0, 1, 4, 2) \
        .reshape(R, gz, gy, P * gx)


def _from_planes(a, gz, gy, gx, R, P):
    """(R, gz, gy, 128) -> flat [n_slots] (inverse of ``_to_planes``)."""
    return a.reshape(R, gz, gy, P, gx).transpose(1, 2, 4, 0, 3) \
        .reshape(gz * gy * gx * R * P)


def _halo_to_planes(a, gy, gx, R, P):
    """One z plane [gy * gx * C] -> (R, gy, 128)."""
    return a.reshape(gy, gx, R, P).transpose(2, 0, 3, 1) \
        .reshape(R, gy, P * gx)


def planeify_layout(lay, grid_size, capacity):
    """Transpose a freshly-built layout into planes linear order, so a
    resident chunk pays ONE state transpose per rebuild instead of
    re-transposing every kernel operand each pass (``pre_planed``).

    T/Tov/pid transpose as channels; slot_of values remap by pure integer
    arithmetic (the map slot -> planes-slot is a fixed permutation); the
    extras side list is order-free."""
    from .common import grid_dims
    gx, gy, gz = grid_dims(grid_size)
    C = capacity
    P = 128 // gx
    R = C // P
    n_slots = lay.pid.shape[0]

    def tp(a):
        return _to_planes(a, gz, gy, gx, R, P).reshape(n_slots)

    so = lay.slot_of
    cube, s = jnp.divmod(jnp.minimum(so, n_slots - 1), C)
    zy, cx = jnp.divmod(cube, gx)
    pr, h = jnp.divmod(s, P)
    ns = ((pr * gz * gy + zy) * 128 + h * gx + cx).astype(so.dtype)
    ns = jnp.where(so < n_slots, ns, n_slots)
    return lay._replace(T=jax.tree.map(tp, lay.T),
                        Tov=jax.tree.map(tp, lay.Tov),
                        pid=tp(lay.pid), slot_of=ns)


def lattice_pairwise_planes(pw_int, pw_friction, layout, n, cube_size, *,
                            grid_size, capacity, z_block, y_block=None,
                            extras_block_cap=16, grid_z=None, n_pad=None,
                            z_halo=None, pre_planed=False):
    """Pairwise sums in slot-plane layout (module docs).  Same contract
    and returns as ``lattice_pallas.lattice_pairwise_pallas``.

    ``pre_planed``: the layout's slot arrays are ALREADY in planes linear
    order (``_to_planes`` applied; ``lattice_heun_steps`` keeps resident
    chunks in that order) -- operand construction is then pure reshapes
    and the results come back in the same order.  The XLA-side transposes
    otherwise cost ~36 ms/pass at 500k (benchmarks/diag_planes_pass.py),
    comparable to the kernel itself."""
    from .common import grid_dims
    gx, gy, gz_full = grid_dims(grid_size)
    C = capacity
    gz = grid_z if grid_z is not None else gz_full
    n_slots = layout.pid.shape[0]
    if n_pad is None:
        n_pad = layout.slot_of.shape[0]
    assert planes_supported(grid_size, capacity)
    P = 128 // gx
    R = C // P
    zb = z_block
    assert gz % zb == 0
    nz = gz // zb
    if y_block is None:
        y_block = DEFAULT_Y_BLOCK
    yb = max((y_block // 8) * 8, 8)
    while gy % yb:
        yb -= 8
    assert yb >= 8 and gy % yb == 0, \
        "grid y extent must be a multiple of 8 for the Pallas kernel"
    ny = gy // yb
    # block-local ids ride f32 lanes: id = ((pr*(zb+2) + z)*(yb+2) + y)*128
    # + lane must stay exactly representable
    assert R * (zb + 2) * (yb + 2) * 128 < 2 ** 24, \
        "z_block * y_block * capacity too large for exact f32 slot ids"

    pw_off = getattr(pw_int, "offdiag", None) or pw_int
    field_leaves, field_tree = jax.tree.flatten(layout.T)
    nf = len(field_leaves)

    def unflatten_pt(leaves):
        return jax.tree.unflatten(field_tree, leaves)

    # ---- trace-time structure probe + dependence analysis (same scheme
    # as the flat kernel) ---------------------------------------------------
    shape = (zb, yb, 128)          # one (row-pair, dz, dy) eval
    shape4 = (R, zb, yb, 128)      # whole i-side block (diag/extras)
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

    dF_probe, aux_probe = _split_probe(
        pw_int(unflatten_pt([ex] * nf), unflatten_pt([ex] * nf),
               jnp.ones_like(ex), ex, ex))
    dF_leaves_probe, dF_tree = jax.tree.flatten(dF_probe)
    n_dF = len(dF_leaves_probe)
    aux_keys = list(aux_probe.keys())
    n_out = n_dF + 1 + len(aux_keys)

    out_t_off, in_live_off = _dependence(
        jax.make_jaxpr(f_off)([ex] * nf, [ex] * nf, (ex, ex)))
    out_t_diag, in_live_diag = _dependence(
        jax.make_jaxpr(f_diag)([ex] * nf, ex))
    xi_need = [in_live_off[k] or in_live_off[nf + k] or in_live_diag[k]
               for k in range(nf)]
    xj_need = [in_live_off[nf + k] for k in range(nf)]
    for k in range(3):
        xi_need[k] = xj_need[k] = True

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

    acc_of_out = {}
    M = 0
    for o in range(n_out):
        if o == n_dF:
            continue
        if out_need[o]:
            acc_of_out[o] = M
            M += 1
    have_fr = fr_off or fr_diag
    SUMF = SUMV = None
    if have_fr:
        SUMF, SUMV = M, M + 1
        M += 4

    if pre_planed:
        planes = lambda a: a.reshape(R, gz, gy, 128)
        hplanes = lambda a: a.reshape(R, gy, 128)
    else:
        planes = partial(_to_planes, gz=gz, gy=gy, gx=gx, R=R, P=P)
        hplanes = partial(_halo_to_planes, gy=gy, gx=gx, R=R, P=P)

    def stack_i(chs):
        return jnp.stack([planes(c) for c in chs])

    def stack_j(chs, halos=None):
        # z halo: one plane each side (sentinel pad, or the exchanged
        # neighbour planes in z-slab mode); y halo: 8 aligned rows each
        # side (HBM DMA slices are 8-aligned in the sublane dim)
        outs = []
        for idx, c in enumerate(chs):
            fill = X_SENTINEL if idx == 0 else 0.0
            a = planes(c)                         # (R, gz, gy, 128)
            if halos is not None:
                lo, hi = halos[idx]
                a = jnp.concatenate([lo[:, None], a, hi[:, None]], axis=1)
                a = jnp.pad(a, ((0, 0), (0, 0), (8, 8), (0, 0)),
                            constant_values=fill)
            else:
                a = jnp.pad(a, ((0, 0), (1, 1), (8, 8), (0, 0)),
                            constant_values=fill)
            outs.append(a)
        return jnp.stack(outs)          # (K_j, R, gz+2, gy+16, 128)

    A_i = stack_i(xi_channels)          # (K_i, R, gz, gy, 128)
    if z_halo is not None:
        lo_l, hi_l, lo_ov3, hi_ov3, lo_occ, hi_occ = z_halo
        lo_p = [jnp.where(lo_occ, lo_l[0], X_SENTINEL)] + list(lo_l[1:])
        hi_p = [jnp.where(hi_occ, hi_l[0], X_SENTINEL)] + list(hi_l[1:])
        halos = [(hplanes(lo_p[k]), hplanes(hi_p[k])) for k in xj_fields] \
            + ([(hplanes(lo_ov3[c]), hplanes(hi_ov3[c])) for c in range(3)]
               if fr_off else [])
        A_j = stack_j(rj_channels, halos)
    else:
        A_j = stack_j(rj_channels)

    # ---- overflow-extras sidecar tables (same block keying as flat) -------
    has_extras = getattr(layout, "E", None) is not None
    E_b = max((extras_block_cap // 8) * 8, 8)
    t_fields = [k for k in range(nf) if xi_need[k] or xj_need[k]]
    tcol = {k: i for i, k in enumerate(t_fields)}
    T_OV = len(t_fields)
    if has_extras:
        ids_tbl, chan_tbl, block_over = _extras_tables(
            layout, t_fields, have_fr, nz, ny, zb, yb,
            cube_size, grid_size, E_b)

    if pre_planed:
        act = occ.reshape(R, nz, zb, ny, yb * 128).any(axis=(0, 2, 4)) \
            .reshape(-1).astype(jnp.int32)
    else:
        act = occ.reshape(nz, zb, ny, yb * gx * C).any(axis=(1, 3)) \
            .reshape(-1).astype(jnp.int32)

    STRY = (yb + 2) * 128
    STRP = (zb + 2) * STRY

    def kernel(scal_ref, act_ref, *refs):
        if has_extras:
            (et_sref, Ai_hbm, Aj_hbm, out_ref, out2_ref,
             xi_ref, rj_ref, rr_ref, sems) = refs
        else:
            Ai_hbm, Aj_hbm, out_ref, xi_ref, rj_ref, rr_ref, sems = refs
        zi = pl.program_id(0)
        yi = pl.program_id(1)
        out_ref[...] = jnp.zeros((M,) + shape4, jnp.float32)
        if has_extras:
            out2_ref[...] = jnp.zeros((E_b, 128), jnp.float32)

        @pl.when(act_ref[zi * ny + yi] > 0)
        def _active_block():
            csize = scal_ref[0]
            cp_i = pltpu.make_async_copy(
                Ai_hbm.at[:, :, pl.ds(zi * zb, zb), pl.ds(yi * yb, yb)],
                xi_ref, sems.at[0])
            cp_j = pltpu.make_async_copy(
                Aj_hbm.at[:, :, pl.ds(zi * zb, zb + 2),
                          pl.ds(yi * yb, yb + 16)],
                rj_ref, sems.at[1])
            cp_i.start()
            cp_j.start()
            cp_i.wait()
            cp_j.wait()

            zero4 = jnp.zeros(shape4, jnp.float32)

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
            cx = lane % gx
            yrow = jax.lax.broadcasted_iota(jnp.int32, (1, yb, 1), 1)
            zrow = jax.lax.broadcasted_iota(jnp.int32, (zb, 1, 1), 0)
            # block-local f32 ids: ((pr*(zb+2) + z)*(yb+2) + y)*128 + lane;
            # i == j exactly on the structural diagonal (same row-plane,
            # same z/y, same lane), which the loop excludes
            pos3 = ((zrow + 1) * (yb + 2) + (yrow + 1)) * 128 + lane
            prow = jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1, 1), 0)
            i_ids4 = (prow * STRP + pos3[None]).astype(jnp.float32)

            # every contribution (diag, extras, windows) accumulates into
            # VALUE locals threaded through the loops; out_ref is written
            # exactly once per block (VMEM read-modify-writes per window
            # measured a 1.4x slowdown)
            def add_into(av, outs, cut, ovj):
                av = list(av)
                for o, acc in acc_of_out.items():
                    v = jnp.broadcast_to(outs[o], shape4)
                    av[acc] = av[acc] + (v if cut is None else v * cut)
                if have_fr:
                    fr = jnp.broadcast_to(outs[n_dF], shape4)
                    if cut is not None:
                        fr = fr * cut
                    av[SUMF] = av[SUMF] + fr
                    for c in range(3):
                        av[SUMV + c] = av[SUMV + c] + fr * ovj[c]
                return av

            acc_v = [zero4] * M

            def call_force(fn, Xi, r, dist, i_ids, j_ids):
                dF, aux = _split_probe(fn(Xi, r, dist, i_ids, j_ids))
                fr = pw_friction(Xi, r, dist, i_ids, j_ids)
                return (jax.tree.leaves(dF) + [fr]
                        + [aux[k] for k in aux_keys])

            # --- self pairs: once per block, whole i-side ------------------
            Xi4_leaves = [xi_ref[xi_fields.index(k)] if xi_need[k]
                          else zero4 for k in range(nf)]
            Xi4 = unflatten_pt(Xi4_leaves)
            if any(live_diag):
                r0 = unflatten_pt([zero4] * nf)
                outs = call_force(pw_int, Xi4, r0, zero4, i_ids4, i_ids4)
                ov_i = ([xi_ref[XI_OV + c] for c in range(3)]
                        if fr_diag else (zero4, zero4, zero4))
                acc_v = add_into(acc_v, outs, None, ov_i)

            # --- overflow extras (against the UNSHIFTED interior) ----------
            if has_extras:
                def jcen(c):
                    return rj_ref[c, :, 1:1 + zb, 8:8 + yb]

                lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                K_t = len(t_fields) + (3 if have_fr else 0)
                base = (zi * ny + yi) * E_b * K_t

                for e in range(E_b):
                    def ecol(c):
                        return et_sref[base + e * K_t + c]

                    xe = {k: ecol(tcol[k]) for k in t_fields}
                    r1_leaves = [
                        (jcen(xj_fields.index(k)) - xe[k])
                        if xj_need[k] else zero4 for k in range(nf)]
                    r1 = unflatten_pt(r1_leaves)
                    d1 = jnp.sqrt(r1.x * r1.x + r1.y * r1.y
                                  + r1.z * r1.z)
                    cut_e = (d1 < csize).astype(jnp.float32)
                    e_id = jnp.float32(-(e + 1))

                    outs1 = call_force(pw_off, Xi4, r1, d1, i_ids4, e_id)
                    ovj1 = tuple(ecol(T_OV + c) for c in range(3)) \
                        if have_fr else (zero4, zero4, zero4)
                    acc_v = add_into(acc_v, outs1, cut_e, ovj1)

                    Xe_pt = unflatten_pt(
                        [xe[k] if k in tcol else 0.0 for k in range(nf)])
                    r2 = unflatten_pt(
                        [-r1_leaves[k] if xj_need[k] else zero4
                         for k in range(nf)])
                    dF2, aux2 = _split_probe(
                        pw_off(Xe_pt, r2, d1, e_id, i_ids4))
                    outs2 = (jax.tree.leaves(dF2)
                             + [pw_friction(Xe_pt, r2, d1, e_id, i_ids4)]
                             + [aux2[k] for k in aux_keys])
                    row = jnp.zeros((1, 128), jnp.float32)
                    for o, acc in acc_of_out.items():
                        s = jnp.sum(jnp.broadcast_to(outs2[o], shape4)
                                    * cut_e)
                        row = row + jnp.where(lane128 == acc, s, 0.0)
                    if have_fr:
                        fr2 = jnp.broadcast_to(outs2[n_dF], shape4) * cut_e
                        row = row + jnp.where(lane128 == SUMF,
                                              jnp.sum(fr2), 0.0)
                        if fr_off:
                            for c in range(3):
                                row = row + jnp.where(
                                    lane128 == SUMV + c,
                                    jnp.sum(fr2 * jcen(RJ_OV + c)), 0.0)
                    out2_ref[e:e + 1, :] = row

            # --- 3P roll variants x fori(pj) x 9 static windows -------------
            # Each (variant, pj, dz, dy) window is evaluated against ALL R
            # i-row-planes at once (the j window is identical for every
            # pi), so vector ops run at (R, zb, yb, 128) granularity with
            # no per-pi loop and no dynamic i-side slicing.
            for dh in range(P):
                for dc in (-1, 0, 1):
                    s_v = dh * gx + dc
                    rr_ref[...] = pltpu.roll(
                        rj_ref[:, :, :, 7:7 + yb + 2], (128 - s_v) % 128,
                        axis=4)
                    # cube-edge validity: i at cube cx pairs j at cx + dc
                    edge = ((cx + dc >= 0) & (cx + dc < gx))[None]
                    jlane = ((lane + s_v) % 128).astype(jnp.float32)[None]
                    identity = (dh == 0 and dc == 0)

                    def pj_body(pj, acc_v, edge=edge, jlane=jlane,
                                identity=identity):
                        jbase = jnp.float32(pj * STRP)
                        for dz in (0, 1, 2):
                            for dy in (0, 1, 2):
                                def jsl(c):
                                    return rr_ref[c, pj, dz:dz + zb,
                                                  dy:dy + yb]

                                r = unflatten_pt(
                                    [(Xi4_leaves[k]
                                      - jsl(xj_fields.index(k)))
                                     if xj_need[k] else zero4
                                     for k in range(nf)])
                                dist = jnp.sqrt(r.x * r.x + r.y * r.y
                                                + r.z * r.z)
                                ok = edge
                                if identity and dz == 1 and dy == 1:
                                    # structural diagonal row: hoisted
                                    # self-pair covers it
                                    ok = ok & (prow != jnp.int32(pj))
                                dist = jnp.where(ok, dist, X_SENTINEL)
                                cut = (dist < csize).astype(jnp.float32)
                                j_ids = (jbase
                                         + ((zrow + dz) * STRY
                                            + (yrow + dy) * 128)
                                         .astype(jnp.float32)[None]
                                         + jlane)
                                outs = call_force(pw_off, Xi4, r, dist,
                                                  i_ids4, j_ids)
                                ovj = ([jsl(RJ_OV + c) for c in range(3)]
                                       if fr_off else (zero4,) * 3)
                                acc_v = add_into(acc_v, outs, cut, ovj)
                        return acc_v

                    if UNROLL_PJ:
                        for pj_s in range(R):
                            acc_v = pj_body(pj_s, acc_v)
                    else:
                        acc_v = jax.lax.fori_loop(0, R, pj_body, acc_v)

            for m_i in range(M):
                out_ref[m_i] = acc_v[m_i]

    pair_lanes = nz * ny * 3 * P * R * R * 9 * zb * yb * 128
    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY)]
    out_specs = [pl.BlockSpec((M, R, zb, yb, 128),
                              lambda zi, yi, *_: (0, 0, zi, yi, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((M, R, gz, gy, 128), jnp.float32)]
    scratch = [pltpu.VMEM((K_i, R, zb, yb, 128), jnp.float32),
               pltpu.VMEM((K_j, R, zb + 2, yb + 16, 128), jnp.float32),
               pltpu.VMEM((K_j, R, zb + 2, yb + 2, 128), jnp.float32)]
    prefetch = [jnp.asarray([cube_size], jnp.float32), act]
    if has_extras:
        prefetch.append(chan_tbl)
        out_specs.append(pl.BlockSpec(
            (None, E_b, 128), lambda zi, yi, *_: (zi * ny + yi, 0, 0),
            memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((nz * ny, E_b, 128), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

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
            bytes_accessed=(K_i + K_j + M) * gz * gy * gx * C * 4),
        interpret=_interpret(),
    )(*prefetch, A_i, A_j)

    if pre_planed:
        unplane = lambda a: a.reshape(n_slots)
    else:
        unplane = partial(_from_planes, gz=gz, gy=gy, gx=gx, R=R, P=P)
    flat = [unplane(out[0][m]) for m in range(M)]

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

    # ---- merge per-block extra reductions + extras-extras pairs (same
    # as the flat kernel) ----------------------------------------------------
    E_cap = layout.epid.shape[0]
    ids_flat = ids_tbl.reshape(-1)
    o2 = out[1].reshape(-1, 128)
    esums = jnp.zeros((E_cap + 1, 128), jnp.float32) \
        .at[ids_flat].add(o2)[:E_cap]
    Fe, sum_fe, sum_ve, aux_e = unpack(
        [esums[:, m] for m in range(M)], jnp.zeros((E_cap,), jnp.float32))

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
