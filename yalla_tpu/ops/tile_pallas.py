"""Pallas TPU kernel for the all-pairs O(N^2) engine (small-N latency path).

The reference's ``compute_tile`` (solvers.cuh:282-339) stages 32 j-points
in CUDA shared memory; the XLA path streams j-blocks through lax.scan.
This kernel evaluates 8 x 128 pair tiles per vreg op -- i rides the
sublanes, j rides the lanes -- with the whole (small) population resident
in VMEM, so a 5k-cell model costs ~n^2/1024 * ops vector instructions and
nothing else: no binning, no gathers, no per-step dispatch overhead
inside the fused scan.

Why it exists: compact adhesive tissues (the sorting class) pack ~20
cells per cube, which drives the dense lattice's capacity C (cost ~C^2)
through the roof at small n, while n^2 is only 26M pairs at 5k.  The
crossover back to the lattice engine is ~10-20k cells (BASELINE.md).

Channel layout:
* j-side: ``[K, NJ, 1, 128]`` rows -- the inner loop indexes dim 1
  (untiled), so every read is one aligned [1, 128] vreg row.
* i-side: ``[K, NI/8, 8, 8]`` column tiles (pre-transposed in XLA; the
  trailing (8, 8) tile satisfies Mosaic's block rule) -- the kernel reads
  static [8, 1] columns per i-group and broadcasts against j rows.
* out: ``[M, NI/8, 8, 8]`` column tiles, transposed back XLA-side.

i == j pairs are INCLUDED (models put reaction terms on the diagonal,
ref examples/turing.cu:38-46); inactive j's are masked by one lane
compare per row; inactive i's produce garbage columns that the caller
discards (same convention as the lattice kernel's empty slots).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import split_force_output as _split

__all__ = ["tile_pairwise_pallas"]


def _interpret():
    return jax.default_backend() == "cpu"


def tile_pairwise_pallas(pw_int, pw_friction, X, old_v, n):
    """All-pairs sums: same contract as ``tile_pairwise`` (pairwise_xla).

    Returns (dF (Pt [n_pad]), sum_friction [n_pad], sum_v 3-tuple, aux).
    ``n_pad`` must be a multiple of 128.
    """
    leaves, tree = jax.tree.flatten(X)
    nf = len(leaves)
    n_pad = leaves[0].shape[0]
    assert n_pad % 128 == 0, "tile Pallas kernel needs n_pad % 128 == 0"
    NJ = n_pad // 128
    NI = n_pad // 8
    # 8 i-columns (64 points) per grid step, stored as [NI/8, 8, 8] tiles:
    # Mosaic blocks must be lane-tile multiples OR the full dimension in
    # their last two dims -- an (8, 8) trailing tile satisfies the rule
    # with static in-kernel column slices and without unrolling a
    # 128-column loop per grid step
    G8 = NI // 8
    n_steps = G8

    unflatten = jax.tree.unflatten

    # ---- probe structure ---------------------------------------------------
    ex = jnp.zeros((8, 128), jnp.float32)
    Xp = unflatten(tree, [ex] * nf)
    dF_p, aux_p = _split(pw_int(Xp, Xp, jnp.ones_like(ex), ex, ex))
    dF_leaves, dF_tree = jax.tree.flatten(dF_p)
    n_dF = len(dF_leaves)
    aux_keys = list(aux_p.keys())
    M = n_dF + 4 + len(aux_keys)          # dF.., sum_f, sum_v xyz, aux..

    # ---- operand layouts ---------------------------------------------------
    A_rows = jnp.stack([a.reshape(NJ, 1, 128) for a in leaves]
                       + [v.reshape(NJ, 1, 128)
                          for v in (old_v.x, old_v.y, old_v.z)])
    # [nf, G8, 8, 8]: [k, g, s, c] = leaf[(g*8 + c)*8 + s]
    A_cols = jnp.stack(
        [a.reshape(G8, 8, 8).transpose(0, 2, 1) for a in leaves])

    def kernel(nref, rows_ref, cols_ref, out_ref):
        gi = pl.program_id(0)
        nn = nref[0]
        jid_row = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        for u in range(8):
            col = lambda k: cols_ref[k, 0, :, u:u + 1]
            Xi = unflatten(tree, [col(k) for k in range(nf)])
            # column (gi, u) holds points (gi*8+u)*8 .. +7 (sublane-major)
            i_ids = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                     + (gi * 8 + u) * 8).astype(jnp.float32)
            accs = [jnp.zeros((8, 128), jnp.float32) for _ in range(M)]

            def body(jt, accs):
                row = lambda k: rows_ref[k, jt]
                Xj = unflatten(tree, [row(k) for k in range(nf)])
                r = Xi - Xj
                dist = jnp.sqrt(r.x * r.x + r.y * r.y + r.z * r.z)
                j_ids = (jid_row + jt * 128).astype(jnp.float32)
                dF, aux = _split(pw_int(Xi, r, dist, i_ids, j_ids))
                fr = pw_friction(Xi, r, dist, i_ids, j_ids)
                cut = ((jid_row + jt * 128) < nn).astype(jnp.float32)
                outs = (jax.tree.leaves(dF)
                        + [fr, fr * row(nf), fr * row(nf + 1),
                           fr * row(nf + 2)]
                        + [aux[k] for k in aux_keys])
                return [a + jnp.broadcast_to(o, (8, 128)) * cut
                        for a, o in zip(accs, outs)]

            accs = jax.lax.fori_loop(0, NJ, body, accs)
            for m in range(M):
                out_ref[m, 0, :, u:u + 1] = jnp.sum(accs[m], axis=1,
                                                    keepdims=True)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((nf + 3, NJ, 1, 128),
                             lambda gi, *_: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nf, 1, 8, 8), lambda gi, *_: (0, gi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, 1, 8, 8),
                                   lambda gi, *_: (0, gi, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((M, G8, 8, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * n_pad * 40, transcendentals=n_pad * n_pad,
            bytes_accessed=(nf * 2 + M) * n_pad * 4),
        interpret=_interpret(),
    )(jnp.asarray([n], jnp.int32), A_rows, A_cols)

    # [M, g, s, c] -> i = g*64 + c*8 + s
    flat = [out[m].transpose(0, 2, 1).reshape(n_pad) for m in range(M)]
    F = jax.tree.unflatten(dF_tree, flat[:n_dF])
    sum_f = flat[n_dF]
    sum_v = (flat[n_dF + 1], flat[n_dF + 2], flat[n_dF + 3])
    aux = {k: flat[n_dF + 4 + i] for i, k in enumerate(aux_keys)}
    return F, sum_f, sum_v, aux
