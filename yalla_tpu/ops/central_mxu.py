"""MXU all-pairs engine for *central* pairwise forces.

The generic all-pairs kernels (``pairwise_xla.tile_pairwise``,
``tile_pallas``) evaluate the full force body per pair on the VPU --
~40+ vector ops per pair.  Most of the reference's mechanics, however,
are **central forces**: the positional force is a scalar radial
coefficient times the pair separation,

    dF_xyz = w(dist, scalars_i, scalars_j) * r        (r = Xi - Xj)

(e.g. the differential-adhesion potentials, ref examples/sorting.cu:16-28,
inits.cuh:78-93 relu_force).  For those the N^2 pass factors into matrix
algebra that the MXU does nearly for free:

* pair distances:   dist^2 = |xi|^2 + |xj|^2 - 2 xi.xj   -- the cross term
  is ``X @ X.T``, one (BI, 8) x (8, n_pad) matmul per i-block;
* force reduction:  F_i = Sum_j w_ij (xi - xj)
                        = xi * rowsum(w) - w @ X        -- ``w @ [X | 1]``;
* friction mixing:  sum_f = rowsum(f),  sum_v = f @ old_v  (solvers.cuh:146-161)
                    -- ``f @ [old_v | 1]``;
* bilinear pair channels (type-pair strength tables, polarity dot
  products): ``ch_ij = a(Xi) . b(Xj)`` -- one (BI, K) x (K, n_pad) matmul.

Only the radial coefficient itself (a handful of ops) remains on the VPU,
so the per-pair instruction count drops from ~40 to ~15 -- this is the
small-N latency path that meets the 5k-cell BASELINE metric.

Numerical note: the matmul form of dist^2 cancels |x|^2-sized terms, so
positions are re-centred on the active population's mean before the
kernel (coordinates ~ tissue extent instead of absolute position); with
``precision=HIGHEST`` the dist error is ~1e-5 * extent^2, far inside the
reference's own tolerance philosophy (minunit.cuh:37).  Exact trajectory
agreement with the generic engines is therefore *statistical*, like
CUDA-vs-TPU agreement itself; tests/test_central.py quantifies it.

Declaring a central force -- ``central_force()`` returns a callable
satisfying the standard pairwise contract (usable by EVERY engine:
tile/grid/lattice/Gabriel), carrying the factored pieces as attributes
that ``TileEngine`` auto-detects for the MXU path:

    adhesion = central_force(
        Cell,
        coef=lambda dist, Si, Sj, strength: strength * F(dist) / dist,
        bilinear={"strength": (lambda X: (ones, X.ctype),
                               (lambda X: (1 + 2 * X.ctype, 2 + 4 * X.ctype)))},
    )

Coefficient contract (same as every reference force functor): ``coef``
must return 0 past its interaction radius and stay FINITE at the
position sentinel (1e4) -- invalid pairs (padding, the i == j diagonal)
are excluded by poisoning their distance, exactly like the lattice
kernel's empty slots (ops/lattice_pallas.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["central_force", "central_pairwise_mxu", "CENTRAL_SENTINEL"]

# poisoned-pair distance: past every physical cutoff, small enough that
# polynomial coefficients of dist stay finite in f32
CENTRAL_SENTINEL = 1e4


def _interpret():
    return jax.default_backend() == "cpu"


class _CentralForce:
    """Callable satisfying the generic pairwise contract; see
    ``central_force``."""

    def __init__(self, Pt, coef, fields, bilinear, aux, diag, name):
        self.Pt = Pt
        self.coef = coef
        self.fields = tuple(fields)
        self.bilinear = dict(bilinear or {})
        self.aux = dict(aux or {})
        self.diag = diag
        self.__name__ = name

    # -- generic elementwise evaluation (any engine) ------------------------
    def _channels(self, Xi, r):
        Si = {f: getattr(Xi, f) for f in self.fields}
        Sj = {f: getattr(Xi, f) - getattr(r, f) for f in self.fields}
        Xj = Xi - r
        ch = {}
        for name, (fa, fb) in self.bilinear.items():
            a, b = fa(Xi), fb(Xj)
            ch[name] = sum(ai * bi for ai, bi in zip(a, b))
        return Si, Sj, ch

    def __call__(self, Xi, r, dist, i, j):
        Si, Sj, ch = self._channels(Xi, r)
        off = (i != j)
        # poisoned dist on the diagonal: coef sees the same inputs the MXU
        # kernel feeds it, so its cutoff gating handles both identically
        d = jnp.where(off, dist, CENTRAL_SENTINEL)
        w = self.coef(d, Si, Sj, **ch)
        zero = jnp.zeros_like(dist + w)
        vals = {"x": w * r.x, "y": w * r.y, "z": w * r.z}
        if self.diag is not None:
            dPt = self.diag(Xi)
            on = 1.0 - off.astype(w.dtype)
            for f in self.Pt._fields:
                dv = getattr(dPt, f)
                if f in vals:
                    vals[f] = vals[f] + on * dv
                elif dv is not None:
                    vals[f] = on * dv
        dF = self.Pt(**{f: vals.get(f, zero) for f in self.Pt._fields})
        if not self.aux:
            return dF
        return dF, {k: g(d, Si, Sj, **ch) for k, g in self.aux.items()}


def central_force(Pt, coef, *, fields=(), bilinear=None, aux=None,
                  diag=None, name="central_force"):
    """Declare a central pairwise force.

    ``coef(dist, Si, Sj, **bilinear_channels) -> w`` is the radial
    coefficient (``dF_xyz = w * r``); ``Si``/``Sj`` are dicts of the
    named per-cell scalar ``fields`` for each side.  ``bilinear`` maps a
    channel name to ``(a, b)`` with ``a(X) -> tuple`` / ``b(X) -> tuple``
    of per-cell columns; the channel delivered to ``coef`` is
    ``sum_k a_k(Xi) * b_k(Xj)`` (on the MXU path: one matmul).  ``aux``
    maps names to per-pair functions with coef's signature, summed over
    neighbours (the counter side channel, SURVEY P3).  ``diag(Xi) -> Pt``
    supplies the i == j reaction term (models put reaction/self dynamics
    there, ref examples/turing.cu:38-46).

    The result follows the standard ``pw_int(Xi, r, dist, i, j)``
    contract on every engine; ``TileEngine`` additionally routes it to
    the MXU kernel (``central_pairwise_mxu``).
    """
    return _CentralForce(Pt, coef, fields, bilinear, aux, diag, name)


def _pad_cols(cols, n_pad, k8):
    """Stack per-cell columns into an (n_pad, k8) matrix."""
    out = jnp.zeros((n_pad, k8), jnp.float32)
    for c, v in enumerate(cols):
        out = out.at[:, c].set(jnp.broadcast_to(v, (n_pad,)))
    return out


def central_pairwise_mxu(cf, pw_friction, X, old_v, n, *, block=128):
    """All-pairs sums for a ``central_force`` on the MXU (module docs).

    Same contract/returns as ``tile_pairwise``: (dF Pt, sum_friction,
    sum_v 3-tuple, aux dict), all ``[n_pad]``.  ``pw_friction`` must
    carry a ``central_coef(dist, Si, Sj)`` attribute (the built-in
    frictions do, ops/common.py).
    """
    fr_coef = pw_friction.central_coef
    leaves = {f: getattr(X, f) for f in X._fields}
    n_pad = leaves["x"].shape[0]
    BI = block
    assert n_pad % BI == 0, "central MXU kernel needs n_pad % block == 0"
    nblk = n_pad // BI

    active = jnp.arange(n_pad, dtype=jnp.int32) < n
    inv_n = 1.0 / jnp.maximum(n.astype(jnp.float32), 1.0)
    cx = jnp.sum(jnp.where(active, leaves["x"], 0.0)) * inv_n
    cy = jnp.sum(jnp.where(active, leaves["y"], 0.0)) * inv_n
    cz = jnp.sum(jnp.where(active, leaves["z"], 0.0)) * inv_n
    # re-centred coordinates; padding rows sit at the sentinel so every
    # pair against them is past any cutoff (no per-pair validity mask)
    xc = jnp.where(active, leaves["x"] - cx, CENTRAL_SENTINEL)
    yc = jnp.where(active, leaves["y"] - cy, CENTRAL_SENTINEL)
    zc = jnp.where(active, leaves["z"] - cz, CENTRAL_SENTINEL)

    sq = xc * xc + yc * yc + zc * zc                   # [n_pad]
    Pd = _pad_cols([xc, yc, zc], n_pad, 8)             # d^2 cross operand
    PdT = Pd.T                                          # [8, n_pad]
    ones = jnp.ones((n_pad,), jnp.float32)
    Pw = _pad_cols([xc, yc, zc, ones], n_pad, 8)       # w @ [X | 1]
    Ov = _pad_cols([old_v.x, old_v.y, old_v.z, ones], n_pad, 8)

    n_f = len(cf.fields)
    k_f = max(8, -(-n_f // 8) * 8)
    S = _pad_cols([leaves[f] for f in cf.fields], n_pad, k_f)
    ST = S.T
    bil_names = list(cf.bilinear.keys())
    As, BTs, kbs = [], [], []
    for name in bil_names:
        fa, fb = cf.bilinear[name]
        a, b = fa(X), fb(X)
        assert len(a) == len(b), f"bilinear '{name}' side arity mismatch"
        kb = max(8, -(-len(a) // 8) * 8)
        As.append(_pad_cols(list(a), n_pad, kb))
        BTs.append(_pad_cols(list(b), n_pad, kb).T)
        kbs.append(kb)

    aux_keys = list(cf.aux.keys())
    n_out = 7 + len(aux_keys)        # Fx Fy Fz sum_f svx svy svz aux..
    assert n_out <= 128, "too many aux channels for one output row"
    HI = jax.lax.Precision.HIGHEST

    def kernel(*refs):
        (pdb_ref, sqi_ref, pwb_ref, sb_ref, pdt_ref, sqj_ref, pw_ref,
         ov_ref, st_ref) = refs[:9]
        bil_a = refs[9:9 + len(bil_names)]
        bil_bt = refs[9 + len(bil_names):9 + 2 * len(bil_names)]
        out_ref = refs[-1]
        bi = pl.program_id(0)

        cross = jax.lax.dot_general(
            pdb_ref[...], pdt_ref[...], (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32)
        d2 = (sqi_ref[...] - 2.0 * cross) + sqj_ref[...]
        rs = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
        dist = d2 * rs
        row = (jax.lax.broadcasted_iota(jnp.int32, (BI, 1), 0) + bi * BI)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        dist = jnp.where(row == col, CENTRAL_SENTINEL, dist)

        Si = {f: sb_ref[:, k:k + 1] for k, f in enumerate(cf.fields)}
        Sj = {f: st_ref[k:k + 1, :] for k, f in enumerate(cf.fields)}
        ch = {name: jax.lax.dot_general(
            a_ref[...], bt_ref[...], (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32)
            for name, a_ref, bt_ref in zip(bil_names, bil_a, bil_bt)}

        w = jnp.broadcast_to(cf.coef(dist, Si, Sj, **ch), (BI, n_pad))
        f = jnp.broadcast_to(fr_coef(dist, Si, Sj), (BI, n_pad))
        Fw = jax.lax.dot_general(
            w, pw_ref[...], (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32)
        Fv = jax.lax.dot_general(
            f, ov_ref[...], (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32)
        cols = [pwb_ref[:, 0:1] * Fw[:, 3:4] - Fw[:, 0:1],
                pwb_ref[:, 1:2] * Fw[:, 3:4] - Fw[:, 1:2],
                pwb_ref[:, 2:3] * Fw[:, 3:4] - Fw[:, 2:3],
                Fv[:, 3:4], Fv[:, 0:1], Fv[:, 1:2], Fv[:, 2:3]]
        for k in aux_keys:
            g = jnp.broadcast_to(cf.aux[k](dist, Si, Sj, **ch),
                                 (BI, n_pad))
            cols.append(jnp.sum(g, axis=1, keepdims=True))
        lane = jax.lax.broadcasted_iota(jnp.int32, (BI, 128), 1)
        acc = jnp.zeros((BI, 128), jnp.float32)
        for c, v in enumerate(cols):
            acc = acc + jnp.where(lane == c, v, 0.0)
        out_ref[...] = acc

    blk = lambda k: pl.BlockSpec((BI, k), lambda bi: (bi, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda r, c: pl.BlockSpec((r, c), lambda bi: (0, 0),
                                     memory_space=pltpu.VMEM)
    in_specs = [blk(8), blk(1), blk(8), blk(k_f),
                full(8, n_pad), full(1, n_pad), full(n_pad, 8),
                full(n_pad, 8), full(k_f, n_pad)]
    args = [Pd, sq[:, None], Pw, S, PdT, sq[None, :], Pw, Ov, ST]
    for A, BT, kb in zip(As, BTs, kbs):
        in_specs.append(blk(kb))
        args.append(A)
    for A, BT, kb in zip(As, BTs, kbs):
        in_specs.append(full(kb, n_pad))
        args.append(BT)

    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BI, 128), lambda bi: (bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * n_pad * (16 + 2 * (16 + 8 * len(bil_names))),
            transcendentals=n_pad * n_pad,
            bytes_accessed=n_pad * (8 + k_f) * 8 + n_pad * 128 * 4),
        interpret=_interpret(),
    )(*args)

    zero = jnp.zeros((n_pad,), jnp.float32)
    vals = {"x": out[:, 0], "y": out[:, 1], "z": out[:, 2]}
    F = cf.Pt(**{f: vals.get(f, zero) for f in cf.Pt._fields})
    sum_f = out[:, 3]
    sum_v = (out[:, 4], out[:, 5], out[:, 6])
    aux = {k: out[:, 7 + i] for i, k in enumerate(aux_keys)}

    # i == j diagonal (reaction terms + any friction self-term), exact,
    # n-sized: the kernel excludes the diagonal by distance poisoning
    ids = jnp.arange(n_pad, dtype=jnp.int32)
    if cf.diag is not None or getattr(pw_friction, "self_friction", False):
        from .common import split_force_output
        rz = jax.tree.map(jnp.zeros_like, X)
        dF_d, aux_d = split_force_output(cf(X, rz, zero, ids, ids))
        F = jax.tree.map(jnp.add, F, dF_d)
        fr_d = pw_friction(X, rz, zero, ids, ids)
        sum_f = sum_f + fr_d
        sum_v = tuple(s + fr_d * v
                      for s, v in zip(sum_v, (old_v.x, old_v.y, old_v.z)))
        aux = {k: aux.get(k, 0.0) + aux_d.get(k, 0.0)
               for k in set(aux) | set(aux_d)}
    return F, sum_f, sum_v, aux
