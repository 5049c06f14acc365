"""Lattice-block MXU pair pass: the round-5 attempt at the ~22x lane
overhead (VERDICT r4 task 3, ROADMAP 5 "per-cube MXU" follow-up).

Formulation (the `central_mxu` transposed-matmul trick at lattice-block
granularity): batch CB = 16 consecutive x-cubes into an i-block of
M = CB * C = 128 rows; its j-candidate SUPERSET per (z, y) row is the
9 (dz, dy) neighbour rows x (CB + 2) x-cubes x C slots = N = 1296 lanes.

  * pair distances ride the MXU:  d^2 = |xi|^2 + |xj|^2 - 2 xi . xj via
    dot_general((8, 128), (8, 1296), contract on the channel axis) -- the
    transposed trick: i-points stay on LANES, no transposes anywhere,
  * the radial coefficient w(d) (relu band / d) and the pair masks
    (cutoff, +-1-cube band, i != j) run on the VPU over the (128, 1296)
    pair matrix -- ~14 ops instead of the flat kernel's full body,
  * the force/friction reductions ride the MXU again:
    dot_general((128, 1296), (8, 1296), contract on the j axis) with
    j-channel columns [x, y, z, 1, ovx, ovy, ovz] -- dF = xi * rowsum(w)
    - w @ xj, sum_v = fr @ ov, sum_f = rowsum(fr).

Cost model (r4 ablation, per PASS at the settled 500k state, gs = 64^3,
C = 8): the flat kernel evaluates 9 (4C - 1) = 279 candidate windows per
i-lane at ~40 VPU ops each (relu body); this pass evaluates 1296
candidates per i at ~14 -- VPU-work ratio 1296 * 14 / (279 * 40) = 1.6x
MORE, to be bought back only if the MXU absorbs the dist + reduction
share (~1/3 of the flat body).  This diagnostic MEASURES the trade on
the committed settled 500k state instead of arguing: correctness vs the
flat XLA pass, then a ms/pass table (BASELINE.md records the outcome).

Run on the TPU host:  python benchmarks/diag_mxu_block.py [n_cells]

OUTCOME (round 5, measured on the settled 500k state, one v5e chip):
CLOSED -- 408.9 ms/pass vs the flat Pallas kernel's 54.0 (7.57x loss),
with ~3e2 force error from the |xi|^2+|xj|^2-2xi.xj cancellation at
tissue coordinates (|x|~30).  The contraction depth is K=3 coordinates,
so the MXU runs <3% utilized while the superset is 4.6x the flat
kernel's candidate lanes; centering would fix the precision only by
re-adding the VPU work the MXU was supposed to absorb.  See BASELINE.md
"Lattice-block MXU pair pass CLOSED".
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yalla_tpu.ops.lattice_pallas import X_SENTINEL

YB = 8  # y rows per block (HBM DMA sublane alignment)


def mxu_block_pass(layout_leaves, ov_leaves, *, gs, C, CB, cutoff,
                   interpret):
    """One relu+friction pair pass over the dense lattice via MXU blocks.

    ``layout_leaves`` = (x, y, z) slot channels viewed [gz, gy, gx * C]
    (sentinel-poisoned empties); ``ov_leaves`` = old_v channels.
    Returns [gz, gy, gx * C, 8] with channels
    (fx, fy, fz, sum_f, svx, svy, svz, unused).
    """
    gx, gy, gz = gs if isinstance(gs, tuple) else (gs, gs, gs)
    W = gx * C
    M = CB * C                     # i-lanes per x-block
    assert M == 128, "CB * C must be one lane tile"
    NXC = (CB + 2) * C             # j-lanes per (dz, dy) row
    N = 9 * NXC
    assert gx % CB == 0
    nx = gx // CB
    ny = gy // YB

    # j-side HBM array with halos: 1 z plane, 8 y rows (sublane-aligned
    # DMA), C lanes each side of x; lane dim padded so every block's
    # 256-lane aligned fetch stays in bounds.  Sentinel poison on x.
    lane_pad_hi = (nx - 1) * M + 256 - (W + C)
    def pad_j(a, fill):
        a3 = a.reshape(gz, gy, W)
        return jnp.pad(a3, ((1, 1), (8, 8), (C, lane_pad_hi)),
                       constant_values=fill)

    Aj = jnp.stack([pad_j(c, X_SENTINEL) for c in layout_leaves]
                   + [pad_j(c, 0.0) for c in ov_leaves])
    Ai = jnp.stack([c.reshape(gz, gy, W) for c in layout_leaves])

    # static (M, N) masks: i in batch cube ci sees superset cube cj iff
    # |ci + 1 - cj| <= 1; the self-pair (centre row, same slot) is i == j
    ci = np.arange(M) // C
    cj = np.tile(np.arange(NXC) // C, 9)
    band = np.abs(ci[:, None] + 1 - cj[None, :]) <= 1
    row_of = np.repeat(np.arange(9), NXC)
    centre = row_of == 4                          # dz == 0, dy == 0
    same_slot = (np.tile(np.arange(NXC), 9)[None, :]
                 == (np.arange(M) + C)[:, None]) & centre[None, :]
    mask_const = jnp.asarray((band & ~same_slot).astype(np.float32))

    def kernel(mask_ref, ai_ref, aj_hbm, out_ref, jbuf, sem):
        zi = pl.program_id(0)
        yi = pl.program_id(1)
        xi_b = pl.program_id(2)
        # fetch the j superset window: z-1..z+1 (padded: zi..zi+2),
        # y*8-8..y*8+16 (24 aligned rows; real +-1 halo at offset 7),
        # lanes x*128 .. x*128+256 (covers the (CB+2)C = 144 live lanes)
        cp = pltpu.make_async_copy(
            aj_hbm.at[:, pl.ds(zi, 3), pl.ds(yi * YB, 24),
                      pl.ds(xi_b * M, 256)],
            jbuf, sem)
        cp.start()
        cp.wait()

        csize = jnp.float32(cutoff)
        for ry in range(YB):
            # Xj rows: channels on sublanes, 9 (dz, dy) windows on lanes
            def jrow(c):
                parts = [jbuf[c, dz, 7 + ry + dy, 0:NXC].reshape(1, NXC)
                         for dz in range(3) for dy in range(3)]
                return jnp.concatenate(parts, axis=1)       # [1, N]

            Xj3 = jnp.concatenate([jrow(c) for c in range(3)], axis=0)
            Xi3 = jnp.concatenate(
                [ai_ref[c, 0, ry].reshape(1, M) for c in range(3)],
                axis=0)                                     # [3, M]

            # MXU: pair dots (transposed: contract the channel axis)
            dots = jax.lax.dot_general(
                Xi3, Xj3, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [M, N]
            sq_i = jnp.sum(Xi3 * Xi3, axis=0).reshape(M, 1)
            sq_j = jnp.sum(Xj3 * Xj3, axis=0).reshape(1, N)
            d2 = jnp.maximum(sq_i + sq_j - 2.0 * dots, 0.0)
            dist = jnp.sqrt(d2)

            # VPU: relu-band coefficient + masks (ref inits.cuh:78-93)
            pos = (dist > 0).astype(jnp.float32)
            near = (dist <= 1.0).astype(jnp.float32) * mask_ref[...]
            cut = (dist < csize).astype(jnp.float32)
            F = 2.0 * jnp.maximum(0.8 - dist, 0.0) \
                - jnp.maximum(dist - 0.8, 0.0)
            inv = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
            w = near * cut * pos * F * inv
            fr = near * cut

            # MXU: reductions -- j-channel columns [x, y, z, 1, ov...]
            ones = jnp.ones((1, N), jnp.float32)
            cols = jnp.concatenate(
                [Xj3, ones] + [jrow(3 + c) for c in range(3)]
                + [jnp.zeros((1, N), jnp.float32)], axis=0)  # [8, N]
            red_w = jax.lax.dot_general(
                w, cols, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [M, 8]
            red_f = jax.lax.dot_general(
                fr, cols, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            xi_l = [ai_ref[c, 0, ry] for c in range(3)]      # [M] lanes
            out = jnp.stack(
                [xi_l[0] * red_w[:, 3] - red_w[:, 0],
                 xi_l[1] * red_w[:, 3] - red_w[:, 1],
                 xi_l[2] * red_w[:, 3] - red_w[:, 2],
                 red_f[:, 3], red_f[:, 4], red_f[:, 5], red_f[:, 6],
                 jnp.zeros((M,), jnp.float32)], axis=1)      # [M, 8]
            out_ref[0, ry] = out

    grid = (gz, ny, nx)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, N), lambda z, y, x: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 1, YB, M), lambda z, y, x: (0, z, y, x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, YB, M, 8), lambda z, y, x: (z, y, x, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gz, gy, W, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((6, 3, 24, 256), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mask_const, Ai, Aj)
    return out


def main():
    on_tpu = jax.default_backend() == "tpu"
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else \
        (500_000 if on_tpu else 2_000)

    from bench import _load_settled, _ic
    from yalla_tpu.models import branching as B
    from yalla_tpu.dtypes import Float3
    from yalla_tpu.ops.lattice_xla import lattice_build

    n_pad = -(-n_cells // 4096) * 4096 if n_cells > 4096 else \
        max(64, -(-n_cells // 64) * 64)
    cached = _load_settled("branching", n_cells, 0, B.Cell)
    if cached is not None:
        X, old_v = cached
    else:
        X, old_v = _ic(n_cells, n_pad, 0), Float3.zeros(n_pad)
        print("# (unsettled IC; run bench.py first for the settled state)",
              file=sys.stderr)

    C, CB = 8, 16
    gx = gy = gz = 64 if n_cells > 100_000 else 16
    cube = 1.0
    n = jnp.int32(n_cells)
    lay = lattice_build(Float3(X.x, X.y, X.z),
                        Float3(old_v.x, old_v.y, old_v.z), n,
                        jnp.float32(cube), (gx, gy, gz), C, 0,
                        pallas_pour=on_tpu)
    print(f"# build: dropped={int(lay.n_dropped)} oob={int(lay.n_oob)}",
          file=sys.stderr)
    occ = lay.pid < n_pad
    leaves = [jnp.where(occ, lay.T.x, X_SENTINEL), lay.T.y, lay.T.z]
    ovs = [lay.Tov.x, lay.Tov.y, lay.Tov.z]

    fn = jax.jit(lambda lv, ov: mxu_block_pass(
        lv, ov, gs=(gx, gy, gz), C=C, CB=CB, cutoff=cube,
        interpret=not on_tpu))
    out = fn(leaves, ovs)
    _ = float(np.asarray(out)[0, 0, 0, 0])

    # oracle: the flat XLA resident pass on the same layout
    from yalla_tpu.inits import relu_force
    from yalla_tpu.ops.common import friction_w_neighbour
    from yalla_tpu.ops.lattice_xla import lattice_pairwise_resident
    F, sum_f, sum_v, aux = jax.jit(
        lambda lay: lattice_pairwise_resident(
            relu_force, friction_w_neighbour, lay, n, jnp.float32(cube),
            grid_size=(gx, gy, gz), capacity=C, z_block=2))(lay)
    o = np.asarray(out).reshape(-1, 8).T
    occn = np.asarray(occ)
    names = ("fx", "fy", "fz", "sum_f", "svx", "svy", "svz")
    refs = (F.x, F.y, F.z, sum_f, sum_v[0], sum_v[1], sum_v[2])
    for k, (name, ref) in enumerate(zip(names, refs)):
        d = np.abs(np.where(occn, o[k] - np.asarray(ref), 0.0))
        print(f"# {name}: max |mxu - flat| = {d.max():.3e}")

    if on_tpu:
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(leaves, ovs)
            _ = float(np.asarray(out)[0, 0, 0, 0])
            t_mxu = (time.perf_counter() - t0) / 10
        from yalla_tpu.ops.lattice_pallas import lattice_pairwise_pallas
        flat = jax.jit(lambda lay: lattice_pairwise_pallas(
            relu_force, friction_w_neighbour, lay, n, jnp.float32(cube),
            grid_size=(gx, gy, gz), capacity=C, z_block=2)[0].x)
        _ = float(np.asarray(flat(lay))[0])
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(10):
                r = flat(lay)
            _ = float(np.asarray(r)[0])
            t_flat = (time.perf_counter() - t0) / 10
        print(f"# ms/pass at n={n_cells}: MXU block {t_mxu * 1e3:.1f} "
              f"vs flat Pallas {t_flat * 1e3:.1f} "
              f"(ratio {t_mxu / t_flat:.2f}x)")


if __name__ == "__main__":
    main()
