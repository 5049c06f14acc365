"""Pallas TPU kernel for the dense cube-lattice pair pass.

The XLA formulation (``lattice_xla.lattice_pairwise_resident``) re-reads
each z-slab from HBM for every one of the 9 x (4C - 1) neighbour shifts
(~30 GB/pass at 500k cells).  This kernel DMAs the slab (plus z/y halo)
into VMEM once per grid step and keeps the whole shift loop on-chip:
HBM traffic drops to ~2x the state size per pass.

Layout contract matches the XLA path: all per-slot f32 channels are stacked
into one ``A[K, gs+2, gs+2, W + 4C]`` array (fields, old_v, occupancy, and
stable ids as f32), outputs stacked as ``O[M, gs, gs, W]``; the force
function is traced straight into the kernel (it is an elementwise jnp
function, so it lowers to Mosaic unchanged).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lattice_pairwise_pallas"]


def _interpret():
    return jax.default_backend() == "cpu"


def lattice_pairwise_pallas(pw_int, pw_friction, layout, n, cube_size, *,
                            grid_size, capacity, z_block):
    """Drop-in replacement for ``lattice_pairwise_resident`` (same returns:
    F (dF-typed tree), sum_friction, sum_v 3-tuple, aux dict; all
    ``[n_slots]``)."""

    gs, C = grid_size, capacity
    n_slots = layout.pid.shape[0]
    n_pad = layout.slot_of.shape[0]
    W = gs * C
    PAD = 2 * C
    # x halo rounded so the padded row width is a multiple of 128 lanes
    # (tpu.dynamic_rotate requires an unpadded lane layout)
    PADX = max(PAD, 64)
    while (W + 2 * PADX) % 128:
        PADX += 1
    zb = z_block
    assert gs % zb == 0
    nz = gs // zb

    occ = (layout.pid < n_pad).astype(jnp.float32)
    pid_f = layout.pid.astype(jnp.float32)

    field_leaves, field_tree = jax.tree.flatten(layout.T)
    in_channels = field_leaves + [layout.Tov.x, layout.Tov.y, layout.Tov.z,
                                  occ, pid_f]
    K = len(in_channels)
    IDX_OVX = len(field_leaves)
    IDX_OCC = K - 2
    IDX_PID = K - 1

    # y halo padded to a sublane-aligned extent (DMA slice shapes must be
    # multiples of the (8, 128) tile)
    GSY = ((gs + 2 + 7) // 8) * 8

    def pack(a):
        return jnp.pad(a.reshape(gs, gs, W),
                       ((1, 1), (1, GSY - gs - 1), (PADX, PADX)))

    A = jnp.stack([pack(a) for a in in_channels])  # [K, gs+2, gs+2, W+2PAD]

    # --- probe the force's output structure at trace time ----------------
    def unflatten_pt(leaves):
        return jax.tree.unflatten(field_tree, leaves)

    probe_shape = (zb, gs, W)
    zeros_p = jnp.zeros(probe_shape)
    Xi_probe = unflatten_pt([zeros_p] * len(field_leaves))
    probe = pw_int(Xi_probe, Xi_probe, jnp.ones(probe_shape),
                   zeros_p, zeros_p)
    if (isinstance(probe, tuple) and not hasattr(probe, "_fields")
            and len(probe) == 2 and isinstance(probe[1], dict)):
        dF_probe, aux_probe = probe
    else:
        dF_probe, aux_probe = probe, {}
    dF_leaves, dF_tree = jax.tree.flatten(dF_probe)
    aux_keys = list(aux_probe.keys())
    M = len(dF_leaves) + 1 + 3 + len(aux_keys)  # F.. sum_f sum_v3 aux..

    shifts = 4 * C - 1
    # shift loop runs in groups: one dynamic base rotation per group, G
    # static sub-windows within (cuts rotate work ~G x; G bounded to keep
    # Mosaic compile time acceptable)
    G = 4
    n_shift_groups = -(-shifts // G)
    combos = [(dz, dy) for dz in (0, 1, 2) for dy in (0, 1, 2)]

    def kernel(scal_ref, A_hbm, out_ref, scratch, sem):
        zi = pl.program_id(0)
        csize = scal_ref[0]
        # one DMA: slab + z halo for all channels
        dma = pltpu.make_async_copy(
            A_hbm.at[:, pl.ds(zi * zb, zb + 2)], scratch, sem)
        dma.start()
        dma.wait()

        lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2) % C

        def row(k, dz, dy):
            # [zb, gs, Wp] padded row of channel k at (dz, dy);
            # dz, dy in {0, 1, 2} (0 = z-1 row); static offsets
            return scratch[k, pl.ds(dz, zb), pl.ds(dy, gs), :]

        def base_rolled(full, g):
            # align group g's first window to lane 0: dynamic rotation by
            # the modular complement (pltpu.roll needs non-negative shifts;
            # Mosaic forbids unaligned *dynamic* lane slices).  Wrapped
            # elements land at lanes >= Wp - rot > W + G -- outside every
            # [u, u + W) sub-window thanks to the halo.
            Wp_ = W + 2 * PADX
            return pltpu.roll(full, Wp_ - (PADX - PAD + 1 + g * G), 2)

        Xi = unflatten_pt([row(k, 1, 1)[..., PADX:PADX + W]
                           for k in range(len(field_leaves))])
        occ_i = row(IDX_OCC, 1, 1)[..., PADX:PADX + W] > 0.5
        i_ids = row(IDX_PID, 1, 1)[..., PADX:PADX + W]

        accs = [jnp.zeros(probe_shape) for _ in range(M)]

        for dz, dy in combos:
            rows = [row(k, dz, dy) for k in range(K)]

            def group(g, accs):
                rolled = [base_rolled(rows[k], g) for k in range(K)]
                for u in range(G):
                    s = g * G + u
                    win = lambda k: rolled[k][..., u:u + W]
                    Xj = unflatten_pt([win(k)
                                       for k in range(len(field_leaves))])
                    ovjx = win(IDX_OVX)
                    ovjy = win(IDX_OVX + 1)
                    ovjz = win(IDX_OVX + 2)
                    occ_j = win(IDX_OCC) > 0.5
                    j_ids = win(IDX_PID)

                    shift = s - (PAD - 1)  # actual x-flat shift
                    dcube = (lane_c + shift + 4 * C) // C - 4
                    in_x = ((dcube >= -1) & (dcube <= 1)
                            & (s < shifts))  # mask group padding

                    r = Xi - Xj
                    dist = jnp.sqrt(r.x * r.x + r.y * r.y + r.z * r.z)
                    mask = occ_i & occ_j & in_x & (dist < csize)

                    out = pw_int(Xi, r, dist, i_ids, j_ids)
                    if (isinstance(out, tuple)
                            and not hasattr(out, "_fields")
                            and len(out) == 2 and isinstance(out[1], dict)):
                        dF, aux = out
                    else:
                        dF, aux = out, {}
                    fr = jnp.where(mask, jnp.broadcast_to(
                        pw_friction(Xi, r, dist, i_ids, j_ids),
                        probe_shape), 0.0)

                    new = []
                    kidx = 0
                    for leaf in jax.tree.leaves(dF):
                        new.append(accs[kidx] + jnp.where(
                            mask, jnp.broadcast_to(leaf, probe_shape), 0.0))
                        kidx += 1
                    new.append(accs[kidx] + fr)
                    kidx += 1
                    for ovj in (ovjx, ovjy, ovjz):
                        new.append(accs[kidx] + fr * ovj)
                        kidx += 1
                    for ak in aux_keys:
                        new.append(accs[kidx] + jnp.where(
                            mask, jnp.broadcast_to(aux[ak], probe_shape),
                            0.0))
                        kidx += 1
                    accs = new
                return accs

            accs = jax.lax.fori_loop(0, n_shift_groups, group, accs)

        for m in range(M):
            out_ref[m] = accs[m]

    Wp = W + 2 * PADX
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nz,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (M, zb, gs, W), lambda zi, *_: (0, zi, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((K, zb + 2, GSY, Wp), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((M, gs, gs, W), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray([cube_size], jnp.float32), A)

    flat = out.reshape(M, n_slots)
    nf = len(dF_leaves)
    F = jax.tree.unflatten(dF_tree, [flat[i] for i in range(nf)])
    sum_f = flat[nf]
    sum_v = (flat[nf + 1], flat[nf + 2], flat[nf + 3])
    aux = {k: flat[nf + 4 + i] for i, k in enumerate(aux_keys)}
    return F, sum_f, sum_v, aux
