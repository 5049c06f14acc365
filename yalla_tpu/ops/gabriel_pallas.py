"""Pallas TPU kernel for the Gabriel-graph pair pass on the dense lattice.

The sorted-window XLA formulation (``grid_xla.gabriel_windowed``) is
gather/compaction-bound: its per-point candidate domain is 9 windows x
~128 lanes, and extracting the ~NC within-cutoff survivors costs a
``take_along_axis`` per channel at XLA:TPU's ~3.5e8 gathered elements/s
(measured profile in BASELINE.md: compaction + midpoint + force ~
370 ms/pass of the ~430 ms floor at 100k cells).

Here the candidate domain is the dense lattice's ``9 x (4C - 1)``
shifted-window sweep (``lattice_pallas`` layout: ~27C candidate lanes
per point instead of ~1150), and the within-cutoff candidates are
compacted IN VMEM by a streaming cursor insertion -- no HBM gathers
anywhere:

* pass A walks the shifted windows once, inserting each candidate's
  (x, y, z) into per-rank VMEM arrays (``pay[r] = where(cand & cnt == r,
  xj, pay[r])``; cnt += cand), then runs the midpoint test on the
  NC-compact arrays -> per-rank ``keep`` masks;
* pass B walks the SAME windows again (cursor replay identifies each
  candidate's rank), evaluates the force full-width, and accumulates it
  under ``keep``; pid / old_v channels ride the full-width window here,
  so only positions ever need compaction.

Blocker-set equivalence with the reference (solvers.cuh:572-597): any k
inside the sphere of radius ``0.5 * gc * d(i,j)`` on the i-j midpoint
has ``d(k,i) <= |k - m| + d/2 < (gc + 1)/2 * d < d`` for gc < 1 -- every
geometric blocker IS a closer candidate of i, and ``d(k,i) < d <
cube_size`` puts it inside i's within-cutoff candidate list; testing
the full list therefore reproduces the reference's closer-only
selection exactly.  A point with more than ``max_candidates``
within-cutoff candidates raises ``__err_gabriel_candidates`` (the
reference silently overruns its fixed 100-entry array instead,
solvers.cuh:525-527).

Unlike ``gabriel_windowed`` (which passes sorted-slot numbers), the
force and friction receive REAL stable point ids (compare
``examples/growth_w_wall.py``'s wall-node exclusion ``i != WALL``,
ref growth_w_wall.cu:49-71): the j-side pid channel rides the window
full-width in pass B and the midpoint test needs no ids at all.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import split_force_output as _split
from .lattice_pallas import X_SENTINEL
from .lattice_xla import lattice_build, slot_to_stable

__all__ = ["gabriel_lattice_pallas"]


def _interpret():
    return jax.default_backend() == "cpu"


def gabriel_lattice_pallas(pw_int, pw_friction, X, old_v, n, cube_size, *,
                           grid_size, capacity, max_candidates=20,
                           gabriel_coefficient=0.8, z_block=2, y_block=8,
                           pallas_pour=None):
    """Gabriel-graph pair sums (same contract as ``gabriel_pairwise``).

    Returns ``(F, sum_friction, sum_v, aux)`` in stable order
    ``[n_pad]``; aux carries ``__err_gabriel_candidates`` (per point),
    ``__err_lattice_dropped`` and ``__err_out_of_grid`` (scalars, the
    lattice analogue of ``__err_grid_overflow``).
    """
    from .common import grid_dims
    gx, gy, gz = grid_dims(grid_size)
    C, NC = capacity, max_candidates
    gc2 = (0.5 * gabriel_coefficient) ** 2
    W = gx * C
    assert W % 128 == 0, "gx * capacity must be a multiple of 128 lanes"
    zb = z_block
    while gz % zb:
        zb -= 1
    nz = gz // zb
    yb = max((y_block // 8) * 8, 8)
    while gy % yb:
        yb -= 8
    assert yb >= 8 and gy % yb == 0, \
        "grid y extent must be a multiple of 8 for the Pallas kernel"
    ny = gy // yb
    n_shifts = 4 * C - 1
    shape = (zb, yb, W)

    n_pad = X.x.shape[0]
    lay = lattice_build(X, old_v, n, cube_size, grid_size, C, 0,
                        pallas_pour=(not _interpret()) if pallas_pour is None
                        else pallas_pour)
    leaves, tree = jax.tree.flatten(lay.T)
    nf = len(leaves)

    # ---- probe structure ---------------------------------------------------
    ex = jnp.zeros((8, 128), jnp.float32)
    Xp = jax.tree.unflatten(tree, [ex] * nf)
    dF_p, aux_p = _split(pw_int(Xp, Xp, jnp.ones_like(ex), ex, ex))
    dF_leaves, dF_tree = jax.tree.flatten(dF_p)
    n_dF = len(dF_leaves)
    aux_keys = list(aux_p.keys())
    # dF.., sum_f, sum_v xyz, aux.., candidate-overflow flag
    M = n_dF + 4 + len(aux_keys) + 1
    OVER = M - 1

    # ---- channel layout ----------------------------------------------------
    occ = lay.pid < n_pad
    pid_f = jnp.where(occ, lay.pid, n_pad).astype(jnp.float32)
    leaves_p = [jnp.where(occ, leaves[0], X_SENTINEL)] + leaves[1:]
    chans = leaves_p + [pid_f, lay.Tov.x, lay.Tov.y, lay.Tov.z]
    K = nf + 4
    PID, OV = nf, nf + 1

    A_i = jnp.stack([c.reshape(gz, gy, W) for c in chans])
    A_j = jnp.stack([
        jnp.pad(c.reshape(gz, gy, W), ((1, 1), (8, 8), (0, 0)),
                constant_values=X_SENTINEL if k == 0 else 0.0)
        for k, c in enumerate(chans)])

    act = occ.reshape(nz, zb, ny, yb * W).any(axis=(1, 3))
    act = act.reshape(-1).astype(jnp.int32)

    def kernel(scal_ref, act_ref, Ai_hbm, Aj_hbm, out_ref,
               xi_ref, rj_ref, pay_ref, sems):
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
                Aj_hbm.at[:, pl.ds(zi * zb, zb + 2),
                          pl.ds(yi * yb, yb + 16)],
                rj_ref, sems.at[1])
            cp_i.start()
            cp_j.start()
            cp_i.wait()
            cp_j.wait()

            zero = jnp.zeros(shape, jnp.float32)
            Xi = jax.tree.unflatten(tree, [xi_ref[k] for k in range(nf)])
            pid_i = xi_ref[PID]

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)

            # empty payload ranks carry the position sentinel: their
            # recomputed distance then exceeds every cutoff, so they are
            # neither blockers nor force partners
            sent = jnp.full(shape, X_SENTINEL)
            for r in range(NC):
                pay_ref[r, 0] = sent
                pay_ref[r, 1] = zero
                pay_ref[r, 2] = zero

            def windows(t, inner, carry):
                """One x-shift iteration: 9 (dz, dy) windows at shift
                ``s = t - (2C - 1)`` of the pre-rolled j-slab; calls
                ``inner(dist_folded, window_slice_fn, carry)`` per
                window and advances the roll."""
                s = t - (2 * C - 1)
                q = lane + s
                dcube = (q + 4 * C) // C - (lane + 4 * C) // C
                valid_x = (q >= 0) & (q < W) & (dcube >= -1) & (dcube <= 1)
                for dz in (0, 1, 2):
                    for dy in (0, 1, 2):
                        def jsl(c):
                            return rj_ref[c, dz:dz + zb, 7 + dy:7 + dy + yb]

                        rx = Xi.x - jsl(0)
                        ry = Xi.y - jsl(1)
                        rz = Xi.z - jsl(2)
                        dist = jnp.sqrt(rx * rx + ry * ry + rz * rz)
                        if dy == 1 and dz == 1:
                            ok = valid_x & (s != 0)
                        else:
                            ok = valid_x
                        dist = jnp.where(ok, dist, X_SENTINEL)
                        carry = inner(dist, jsl, carry)
                rj_ref[...] = pltpu.roll(rj_ref[...], W - 1, axis=3)
                return carry

            # ---- pass A: compact candidate positions ----------------------
            def insert(dist, jsl, cnt):
                cand = dist < csize
                for r in range(NC):
                    sel = cand & (cnt == r)
                    for p in range(3):
                        pay_ref[r, p] = jnp.where(sel, jsl(p),
                                                  pay_ref[r, p])
                return cnt + cand.astype(jnp.float32)

            rj_ref[...] = pltpu.roll(rj_ref[...], 2 * C - 1, axis=3)
            cnt_a = jax.lax.fori_loop(
                0, n_shifts, lambda t, c: windows(t, insert, c), zero)
            out_ref[OVER] = (cnt_a > NC).astype(jnp.float32)

            # ---- midpoint test on the compact set --------------------------
            # keep[r]: no other candidate k inside the sphere of radius
            # 0.5 * gc * d(i, r) on the i-r midpoint (ref solvers.cuh:572-597)
            xc = [pay_ref[r, 0] for r in range(NC)]
            yc = [pay_ref[r, 1] for r in range(NC)]
            zc = [pay_ref[r, 2] for r in range(NC)]
            d2c = [(Xi.x - xc[r]) ** 2 + (Xi.y - yc[r]) ** 2
                   + (Xi.z - zc[r]) ** 2 for r in range(NC)]
            csize2 = csize * csize
            keeps = []
            for r in range(NC):
                mx = (Xi.x + xc[r]) * 0.5
                my = (Xi.y + yc[r]) * 0.5
                mz = (Xi.z + zc[r]) * 0.5
                rad2 = d2c[r] * gc2
                blocked = jnp.zeros(shape, bool)
                for k in range(NC):
                    if k == r:
                        continue
                    dk2 = ((mx - xc[k]) ** 2 + (my - yc[k]) ** 2
                           + (mz - zc[k]) ** 2)
                    blocked = blocked | ((dk2 < rad2) & (d2c[k] < csize2))
                keeps.append((d2c[r] < csize2) & ~blocked)

            # ---- pass B: force on kept pairs (cursor replay) ---------------
            def accumulate(outs, cut, ovj):
                for o in range(n_dF):
                    out_ref[o] += jnp.broadcast_to(outs[o], shape) * cut
                fr = jnp.broadcast_to(outs[n_dF], shape) * cut
                out_ref[n_dF] += fr
                for c in range(3):
                    out_ref[n_dF + 1 + c] += fr * ovj[c]
                for a, k in enumerate(aux_keys):
                    out_ref[n_dF + 4 + a] += \
                        jnp.broadcast_to(outs[n_dF + 1 + a], shape) * cut

            def call(fn, r_pt, dist, pid_j):
                dF, aux = _split(fn(Xi, r_pt, dist, pid_i, pid_j))
                fr = pw_friction(Xi, r_pt, dist, pid_i, pid_j)
                return (jax.tree.leaves(dF)
                        + [jnp.broadcast_to(fr, shape)]
                        + [aux[k] for k in aux_keys])

            def force(dist, jsl, cnt):
                cand = dist < csize
                keep = jnp.zeros(shape, bool)
                for r in range(NC):
                    keep = keep | ((cnt == r) & keeps[r])
                cut = (cand & keep).astype(jnp.float32)
                r_pt = jax.tree.unflatten(
                    tree, [Xi[k] - jsl(k) for k in range(nf)])
                outs = call(pw_int, r_pt, dist, jsl(PID))
                accumulate(outs, cut, tuple(jsl(OV + c) for c in range(3)))
                return cnt + cand.astype(jnp.float32)

            # rewind the roll to pass-A start (net offset so far:
            # (2C-1) - (4C-1) = -2C; pass B needs +(2C-1) again)
            rj_ref[...] = pltpu.roll(rj_ref[...], 4 * C - 1, axis=3)
            jax.lax.fori_loop(
                0, n_shifts, lambda t, c: windows(t, force, c), zero)

            # ---- diagonal (i == j): reaction/self terms, real ids ----------
            r0 = jax.tree.unflatten(tree, [zero] * nf)
            outs = call(pw_int, r0, zero, pid_i)
            accumulate(outs, jnp.ones(shape, jnp.float32),
                       tuple(xi_ref[OV + c] for c in range(3)))

    pair_lanes = nz * ny * n_shifts * 9 * zb * yb * W * 2
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nz, ny),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[pl.BlockSpec((M, zb, yb, W),
                                    lambda zi, yi, *_: (0, zi, yi, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[
                pltpu.VMEM((K, zb, yb, W), jnp.float32),
                pltpu.VMEM((K, zb + 2, yb + 16, W), jnp.float32),
                pltpu.VMEM((NC, 3, zb, yb, W), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((M, gz, gy, W), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=pair_lanes * (20 + 5 * NC), transcendentals=pair_lanes,
            bytes_accessed=2 * K * gz * gy * W * 4),
        interpret=_interpret(),
    )(jnp.asarray([cube_size], jnp.float32), act, A_i, A_j)

    flat = out[0].reshape(M, gx * gy * gz * C)
    back = lambda t: slot_to_stable(lay, t)
    F = back(jax.tree.unflatten(dF_tree, [flat[o] for o in range(n_dF)]))
    sum_f = back(flat[n_dF])
    sum_v = tuple(back(flat[n_dF + 1 + c]) for c in range(3))
    aux = {k: back(flat[n_dF + 4 + a]) for a, k in enumerate(aux_keys)}
    aux["__err_gabriel_candidates"] = back(flat[OVER])
    aux["__err_lattice_dropped"] = lay.n_dropped.astype(jnp.float32)
    aux["__err_out_of_grid"] = lay.n_oob.astype(jnp.float32)
    return F, sum_f, sum_v, aux
