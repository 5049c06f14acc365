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


def lattice_pairwise_pallas(pw_int, pw_friction, layout, n, cube_size, *,
                            grid_size, capacity, z_block, y_block=8):
    """Pairwise sums in lattice layout on the TPU VPU (see module docs).

    Returns (F (dF-typed tree), sum_friction, sum_v 3-tuple, aux dict),
    all ``[n_slots]`` -- identical to ``lattice_pairwise_resident``.

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
    """
    gs, C = grid_size, capacity
    n_slots = layout.pid.shape[0]
    n_pad = layout.slot_of.shape[0]
    W = gs * C
    assert W % 128 == 0, "gs * capacity must be a multiple of 128 lanes"
    zb = z_block
    assert gs % zb == 0
    nz = gs // zb
    yb = min(y_block, gs)
    while gs % yb:
        yb -= 1
    ny = gs // yb
    # block-local slot ids ride f32 lanes; they (plus the largest window
    # offset) must stay exactly representable
    assert (zb + 2) * (yb + 2) * W + 2 * C < 2 ** 24, \
        "z_block * y_block * gs * C too large for exact f32 slot ids"
    n_shifts = 4 * C - 1        # flat x shifts cover cube offsets -1..+1

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
        return jnp.stack([c.reshape(gs, gs, W) for c in chs])

    def stack_j(chs):
        # one halo plane each side in BOTH z and y (the block DMA windows);
        # the position sentinel in the pad poisons out-of-grid partners
        outs = []
        for idx, c in enumerate(chs):
            fill = X_SENTINEL if idx == 0 else 0.0
            outs.append(jnp.pad(c.reshape(gs, gs, W),
                                ((1, 1), (1, 1), (0, 0)),
                                constant_values=fill))
        return jnp.stack(outs)

    A_i = stack_i(xi_channels)        # [K_i, gs, gs, W]
    A_j = stack_j(rj_channels)        # [K_j, gs+2, gs+2, W]

    # per-block i-side occupancy: blocks with no live slot skip the whole
    # offset loop (their sentinel i-lanes would only accumulate garbage
    # that lattice_unbuild discards anyway, and their j-side halo
    # contributions to live neighbours ride A_j regardless)
    act = occ.reshape(nz, zb, ny, yb * W).any(axis=(1, 3))
    act = act.reshape(-1).astype(jnp.int32)

    def kernel(scal_ref, act_ref, Ai_hbm, Aj_hbm, out_ref, xi_ref, rj_ref,
               sems):
        zi = pl.program_id(0)
        yi = pl.program_id(1)
        out_ref[...] = jnp.zeros((M,) + shape, jnp.float32)

        @pl.when(act_ref[zi * ny + yi] > 0)
        def _active_block():
            csize = scal_ref[0]
            cp_i = pltpu.make_async_copy(
                Ai_hbm.at[:, pl.ds(zi * zb, zb), pl.ds(yi * yb, yb)],
                xi_ref, sems.at[0])
            cp_j = pltpu.make_async_copy(
                Aj_hbm.at[:, pl.ds(zi * zb, zb + 2), pl.ds(yi * yb, yb + 2)],
                rj_ref, sems.at[1])
            cp_i.start()
            cp_j.start()
            cp_i.wait()
            cp_j.wait()

            zero = jnp.zeros(shape, jnp.float32)
            Xi_leaves = [xi_ref[xi_fields.index(k)] if xi_need[k]
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
                ov_i = ([xi_ref[XI_OV + c] for c in range(3)]
                        if fr_diag else (zero, zero, zero))
                accumulate(outs, None, ov_i)

            # --- 9 x (4C - 1) offset loop ----------------------------------
            # j-block pre-rolled so iteration t sees shift s = t - (2C - 1):
            # rolled[l] = orig[l + s].  The (dz, dy) windows are free static
            # slices of the halo'd j-block -- no rolls, no edge masks.
            rj_ref[...] = pltpu.roll(rj_ref[...], 2 * C - 1, axis=3)

            def body(t, _):
                s = t - (2 * C - 1)
                q = lane + s                   # partner's flat x position
                dcube = (q + 4 * C) // C - (lane + 4 * C) // C
                valid_x = (q >= 0) & (q < W) & (dcube >= -1) & (dcube <= 1)

                for dz in (0, 1, 2):
                    for dy in (0, 1, 2):
                        def jsl(c):
                            return rj_ref[c, dz:dz + zb, dy:dy + yb]

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
                rj_ref[...] = pltpu.roll(rj_ref[...], W - 1, axis=3)
                return 0

            jax.lax.fori_loop(0, n_shifts, body, 0)

    pair_lanes = nz * ny * n_shifts * 9 * zb * yb * W
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nz, ny),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (M, zb, yb, W), lambda zi, yi, *_: (0, zi, yi, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((K_i, zb, yb, W), jnp.float32),
                pltpu.VMEM((K_j, zb + 2, yb + 2, W), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((M, gs, gs, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=pair_lanes * 40, transcendentals=pair_lanes,
            bytes_accessed=(K_i + K_j + M) * gs * gs * W * 4),
        interpret=_interpret(),
    )(jnp.asarray([cube_size], jnp.float32), act, A_i, A_j)

    flat = out.reshape(M, n_slots)
    zeros_flat = jnp.zeros((n_slots,), jnp.float32)

    def out_slot(o):
        return flat[acc_of_out[o]] if o in acc_of_out else zeros_flat

    F = jax.tree.unflatten(dF_tree, [out_slot(o) for o in range(n_dF)])
    sum_f = flat[SUMF] if have_fr else zeros_flat
    sum_v = tuple(flat[SUMV + c] for c in range(3)) if have_fr \
        else (zeros_flat,) * 3
    aux = {k: out_slot(n_dF + 1 + i) for i, k in enumerate(aux_keys)}
    return F, sum_f, sum_v, aux
