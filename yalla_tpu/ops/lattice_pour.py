"""Pallas pour: cube-sorted channels -> dense lattice slots on the VPU.

``lattice_build`` places each sorted cell at slot ``cid * C + rank`` with
one XLA scatter per channel; at 500k cells the 12 scatters cost ~5 ms each
(XLA:TPU scatter is ~1e8 updates/s regardless of locality), making the
REBUILD -- not the pair pass -- the dominant cost of the staleness-
certified cadence.  This kernel replaces them with a conflict-free
butterfly routing network:

* The map sorted-position -> slot is MONOTONE (cube ids ascend, ranks
  ascend within a cube), so the placement decomposes into
  - phase 1, COMPACTION (shift down, LSB-first stages): drop the
    out-of-capacity/inactive entries and the DMA alignment junk, packing
    the placed cells to flat positions 0..k-1 in order;
  - phase 2, EXPANSION (shift up, MSB-first stages): push cell of rank q
    up to its slot-local offset, inserting the empty-slot gaps.
  Both phases move every element by its per-element remaining shift in
  log2 stages of static whole-vreg rolls + selects -- no gathers, no
  scatters, no in-kernel transposes or reshapes.  (MSB-first compaction
  and LSB-first expansion DO collide; the schedule is load-bearing and
  pinned by tests/test_pour.py.)
* One Pallas grid step handles 8 consecutive (z, y) rows: output slots
  ``[b*8W, (b+1)*8W)`` (W = gs * C lanes per row), input window = the
  8 rows' contiguous sorted runs, DMA'd from HBM at a 1024-aligned offset
  (the sublane dim of the [K, n_pad/128, 128] view is sliced 8-aligned).
* Elements the stage budget cannot route (window overflow / pathological
  spill) are COUNTED and returned; the caller adds them to ``n_dropped``
  so the in-loop D_ASSERT flags surface them exactly like capacity drops
  (ref solvers.cuh:82,90).

Layout contract: flat window position f <-> (sublane f//128, lane f%128);
the slot output rides the same flat order as [n_slots/128, 128], which
XLA reshapes back to [n_slots] outside the kernel (free relayout).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pour_pallas", "pour_supported"]

# f32 slot-target sentinel for entries that must not be placed: beyond any
# valid slot id, exactly representable, and far below f32 rounding issues
DST_SENTINEL = float(2 ** 25)


def _interpret():
    return jax.default_backend() == "cpu"


def pour_supported(n_pad, grid_size, capacity):
    from .common import grid_dims
    gx, gy, gz = grid_dims(grid_size)
    W = gx * capacity
    return (W % 128 == 0 and W * 8 <= 2 ** 14
            and (gy * gz) % 8 == 0
            and n_pad % 128 == 0 and n_pad >= 2 ** 13
            and gx * gy * gz * capacity < 2 ** 24)


def _flat_roll_down(x, d, sub, lane):
    """y[f] = x[f + d] on the flat (sublane-major) order of a [S, 128]
    array; wrapped tail lanes carry junk (callers keep a dead margin)."""
    dl, ds = d % 128, d // 128
    if dl == 0:
        return pltpu.roll(x, (sub - ds) % sub, axis=0) if ds else x
    a = pltpu.roll(x, 128 - dl, axis=1)
    A = pltpu.roll(a, (sub - ds) % sub, axis=0)
    B = pltpu.roll(a, (sub - ds - 1) % sub, axis=0)
    return jnp.where(lane < 128 - dl, A, B)


def _flat_roll_up(x, d, sub, lane):
    """y[f] = x[f - d]; wrapped head lanes carry junk."""
    dl, ds = d % 128, d // 128
    if dl == 0:
        return pltpu.roll(x, ds, axis=0) if ds else x
    a = pltpu.roll(x, dl, axis=1)
    A = pltpu.roll(a, ds, axis=0)
    B = pltpu.roll(a, ds + 1, axis=0)
    return jnp.where(lane >= dl, A, B)


def pour_pallas(S, row_starts, n_pad, grid_size, capacity, spill_cap=1024):
    """Pour cube-sorted channels into dense lattice slots.

    S: [K, n_pad] f32 stack; S[K-1] is the global slot target per sorted
    entry (``cid * C + rank``; DST_SENTINEL for entries to drop).
    row_starts: [gy*gz + 1] i32, first sorted position per (z, y) row.

    Returns (out [K-1, n_slots] f32 (0.0-filled empties),
             live [n_slots] f32 (1.0 where a cell was placed),
             n_unrouted i32 (cells the stage budget could not place --
             callers must surface these like capacity drops)).
    """
    from .common import grid_dims
    K = S.shape[0]
    gx, gy, gz = grid_dims(grid_size)
    C = capacity
    W = gx * C
    n_rows = gy * gz
    n_blocks = n_rows // 8
    BW = 8 * W                      # output slots per block
    BWIN = BW + 1024 + spill_cap    # window: runs + align slop + spill
    BWIN = -(-BWIN // 1024) * 1024
    SUB = BWIN // 128
    n_slots = n_rows * W
    # phase-1 stage budget must cover alignment junk + spill; phase 2 the
    # full block width
    p1_stages = [1 << b for b in range(0, (1024 + spill_cap).bit_length())]
    p2_stages = [1 << b for b in range((BW - 1).bit_length() - 1, -1, -1)]

    # pad so the last block's window slice stays in range
    n_al = -(-(n_pad + BWIN) // 1024) * 1024
    Sp = jnp.pad(S, ((0, 0), (0, n_al - n_pad)))
    # padded dst = 0.0 would place at slot 0: poison it
    Sp = Sp.at[K - 1, n_pad:].set(DST_SENTINEL)
    Sv = Sp.reshape(K, n_al // 128, 128)

    def kernel(rs_ref, hbm, out_ref, live_ref, err_ref, win, sems):
        b = pl.program_id(0)
        start = rs_ref[b * 8]
        end = rs_ref[b * 8 + 8]
        a_base = (start // 1024) * 1024

        out_ref[...] = jnp.zeros((K - 1, BW // 128, 128), jnp.float32)
        live_ref[...] = jnp.zeros((BW // 128, 128), jnp.float32)
        err_ref[...] = jnp.zeros((8, 128), jnp.float32)

        @pl.when(end > start)
        def _nonempty():
            cp = pltpu.make_async_copy(
                hbm.at[:, pl.ds(a_base // 128, SUB)], win, sems)
            cp.start()
            cp.wait()

            lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
            sub8 = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0)
            flat = sub8 * 128 + lane

            dst = win[K - 1].astype(jnp.int32)
            # entries past the block's run are junk (next blocks' cells)
            in_run = (flat >= start - a_base) & (flat < end - a_base)
            t = dst - b * BW
            live = in_run & (t >= 0) & (t < BW)

            # exclusive prefix count of live over the flat order:
            # lane-level then sublane-level log stages
            acc = live.astype(jnp.float32)
            for d in (1, 2, 4, 8, 16, 32, 64):
                acc = acc + jnp.where(
                    lane >= d, pltpu.roll(acc, d, axis=1), 0.0)
            rowtot = jnp.broadcast_to(acc[:, 127:128], (SUB, 128))
            rtot = rowtot
            for d in (1, 2, 4, 8, 16, 32):
                if d < SUB:
                    rtot = rtot + jnp.where(
                        sub8 >= d, pltpu.roll(rtot, d, axis=0), 0.0)
            rank = (acc + (rtot - rowtot) - live).astype(jnp.int32)

            rem = jnp.where(live, flat - rank, 0)
            # stage-budget guard: unroutable cells are counted and dropped
            # (surfaced by the caller like capacity drops)
            p1_cap = sum(p1_stages)
            bad1 = live & (rem > p1_cap)
            n_bad = jnp.sum(bad1.astype(jnp.float32))
            live = live & ~bad1
            rem = jnp.where(live, rem, 0)

            fl = live.astype(jnp.float32)
            data = [win[k] for k in range(K - 1)] + [t.astype(jnp.float32)]

            def stage(vals, fl, rem, d, up):
                # BIT test in both directions: the conflict-free schedules
                # are LSB-first bit-moves down (compaction) and MSB-first
                # bit-moves up (expansion) -- pinned by tests/test_pour.py
                mv = (rem & d) > 0
                mv = mv & (fl > 0.5)
                shift = _flat_roll_up if up else _flat_roll_down
                mvs = shift(mv.astype(jnp.float32), d, SUB, lane) > 0.5
                out = []
                for v in vals:
                    vs = shift(v, d, SUB, lane)
                    out.append(jnp.where(mvs, vs, v))
                fls = shift(fl, d, SUB, lane)
                fl = jnp.where(mvs, fls, jnp.where(mv, 0.0, fl))
                rs_ = shift(rem.astype(jnp.float32), d, SUB, lane)
                rem = jnp.where(mvs, rs_.astype(jnp.int32) - d,
                                jnp.where(mv, 0, rem))
                return out, fl, rem

            for d in p1_stages:
                data, fl, rem = stage(data, fl, rem, d, up=False)

            # phase 2: target offset rides data[-1]; remaining shift up
            live2 = fl > 0.5
            rank2 = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 0) \
                * 128 + lane
            t2 = data[-1].astype(jnp.int32)
            rem2 = jnp.where(live2, t2 - rank2, 0)
            bad2 = live2 & ((rem2 < 0) | (rem2 > sum(p2_stages)))
            n_bad = n_bad + jnp.sum(bad2.astype(jnp.float32))
            fl = jnp.where(bad2, 0.0, fl)
            rem2 = jnp.where(bad2, 0, rem2)

            data = data[:K - 1]
            for d in p2_stages:
                data, fl, rem2 = stage(data, fl, rem2, d, up=True)

            ok = (fl > 0.5) & (rem2 == 0)
            okf = ok.astype(jnp.float32)
            for k in range(K - 1):
                out_ref[k] = jnp.where(ok[:BW // 128], data[k][:BW // 128],
                                       0.0)
            live_ref[...] = okf[:BW // 128]
            # any live cell left unplaced (should be impossible given the
            # conflict-free schedule) also counts as unrouted, as do cells
            # of this block's rows beyond the DMA window entirely
            n_bad = n_bad + jnp.sum(
                jnp.where((fl > 0.5) & ~ok, 1.0, 0.0))
            n_bad = n_bad + jnp.maximum(
                end - a_base - BWIN, 0).astype(jnp.float32)
            # no scalar stores to VMEM: broadcast the count to a full row
            err_ref[...] = jnp.broadcast_to(n_bad, (8, 128))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((K - 1, BW // 128, 128),
                         lambda b, *_: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BW // 128, 128), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((K, SUB, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    out, live, err = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((K - 1, n_blocks * (BW // 128), 128),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * (BW // 128), 128), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * BWIN * (K + 4) * 25, transcendentals=0,
            bytes_accessed=(K * n_al + K * n_slots) * 4),
        interpret=_interpret(),
    )(row_starts, Sv)
    return (out.reshape(K - 1, n_slots), live.reshape(n_slots),
            jnp.sum(err[:, 0, 0]).astype(jnp.int32))
