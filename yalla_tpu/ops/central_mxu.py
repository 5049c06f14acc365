"""MXU all-pairs engine for *central* pairwise forces.

The generic all-pairs kernels (``pairwise_xla.tile_pairwise``,
``tile_pallas``) evaluate the full force body per pair on the VPU --
~40+ vector ops per pair.  Most of the reference's mechanics, however,
are **central forces**: the positional force is a scalar radial
coefficient times the pair separation,

    dF_xyz = w(dist, scalars_i, scalars_j) * r        (r = Xi - Xj)

(e.g. the differential-adhesion potentials, ref examples/sorting.cu:16-28,
inits.cuh:78-93 relu_force).  For those the heavy *reductions* of the N^2
pass factor into thin matrix algebra the MXU does nearly for free:

* force reduction:  F_i = Sum_j w_ij (xi - xj)
                        = xi * rowsum(w) - w^T-reduced  -- one
  ``[X | 1]^T (8, n_pad) @ w^T (n_pad, BI)`` matmul per i-block (M = 8
  streams through the systolic array in 8 rows; the untransposed
  ``w @ [X | 1]`` form would pad its N = 8 up to the 128-lane tile and
  cost 16x the MXU cycles);
* friction mixing:  sum_f / sum_v (solvers.cuh:146-161) -- the same
  ``[old_v | 1]^T @ f^T`` matmul shape.

Everything per-pair stays on the VPU in the same transposed ``(n_pad,
BI)`` orientation: the distance is an exact-f32 broadcast subtract (~8
ops -- cheaper than an MXU cross-term at f32 precision, and with no
|x|^2 cancellation to re-centre away), and bilinear pair channels
(type-pair strength tables) are rank-k broadcast products,
``ch_ij = sum_k a_k(Xi) b_k(Xj)`` at 2k ops.  The per-pair instruction
count is ~20 and the reductions are free -- this is the small-N latency
path that meets the 5k-cell BASELINE metric.

Numerical note: distances are exact f32 (identical to the generic
engines); only the force/friction *sums* differ from the handwritten
functor path by f32 matmul summation order (HIGHEST precision).
tests/test_central.py quantifies the agreement.

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


def _pad_rows(rows, n_pad, k8):
    """Stack per-cell columns into a (k8, n_pad) row matrix."""
    out = jnp.zeros((k8, n_pad), jnp.float32)
    for r, v in enumerate(rows):
        out = out.at[r, :].set(jnp.broadcast_to(v, (n_pad,)))
    return out


def central_pairwise_mxu(cf, pw_friction, X, old_v, n, *, block=128):
    """All-pairs sums for a ``central_force`` on the MXU (module docs).

    Same contract/returns as ``tile_pairwise``: (dF Pt, sum_friction,
    sum_v 3-tuple, aux dict), all ``[n_pad]``.  ``pw_friction`` must
    carry a ``central_coef(dist, Si, Sj)`` attribute (the built-in
    frictions do, ops/common.py).

    Orientation note (round-4 rewrite): the pair matrix is computed
    TRANSPOSED -- ``(n_pad, BI)``, j on sublanes, the i block on lanes --
    so the force/friction reductions are ``(8, n_pad) @ (n_pad, BI)``
    matmuls: M = 8 streams through the MXU in 8 rows instead of padding
    an N = 8 output up to the 128-lane tile (a 16x MXU-cycle saving that
    lets them run at HIGHEST precision for free).  Pair distances moved
    OFF the MXU entirely: the broadcast subtract is ~8 VPU ops and, being
    exact f32, needs no re-centring and no |x|^2 cancellation care (the
    round-3 kernel's matmul cross-term did).  Bilinear channels are
    evaluated as rank-k broadcast products (2k VPU ops) instead of
    K = 8-padded matmuls.
    """
    fr_coef = pw_friction.central_coef
    leaves = {f: getattr(X, f) for f in X._fields}
    n_pad = leaves["x"].shape[0]
    BI = block
    assert n_pad % BI == 0, "central MXU kernel needs n_pad % block == 0"
    nblk = n_pad // BI

    active = jnp.arange(n_pad, dtype=jnp.int32) < n
    # padding rows/lanes sit at the sentinel so every pair against them is
    # past any cutoff; pad-vs-pad pairs (dist 0) only contaminate pad
    # outputs, which the integrator's occupancy masking discards
    xc = jnp.where(active, leaves["x"], CENTRAL_SENTINEL)
    yc = jnp.where(active, leaves["y"], CENTRAL_SENTINEL)
    zc = jnp.where(active, leaves["z"], CENTRAL_SENTINEL)

    ones = jnp.ones((n_pad,), jnp.float32)
    PwT = _pad_rows([xc, yc, zc, ones], n_pad, 8)      # [Xj | 1] reduction
    OvT = _pad_rows([old_v.x, old_v.y, old_v.z, ones], n_pad, 8)

    n_f = len(cf.fields)
    bil_names = list(cf.bilinear.keys())
    bil_ab = [(fa(X), fb(X)) for fa, fb in
              (cf.bilinear[name] for name in bil_names)]
    for name, (a, b) in zip(bil_names, bil_ab):
        assert len(a) == len(b), f"bilinear '{name}' side arity mismatch"
    arities = [len(a) for a, _ in bil_ab]
    # i-side rows: coords, scalar fields, bilinear a_k; j-side columns:
    # coords, scalar fields, bilinear b_k
    i_rows = [xc, yc, zc] + [leaves[f] for f in cf.fields] \
        + [jnp.broadcast_to(v, (n_pad,)) for a, _ in bil_ab for v in a]
    j_cols = [xc, yc, zc] + [leaves[f] for f in cf.fields] \
        + [jnp.broadcast_to(v, (n_pad,)) for _, b in bil_ab for v in b]
    KI = max(8, -(-len(i_rows) // 8) * 8)
    Ri = _pad_rows(i_rows, n_pad, KI)                   # [KI, n_pad]
    Cj = _pad_rows(j_cols, n_pad, KI).T                 # [n_pad, KI]

    aux_keys = list(cf.aux.keys())
    n_out = 7 + len(aux_keys)        # Fx Fy Fz sum_f svx svy svz aux..
    NO = max(8, -(-n_out // 8) * 8)
    assert n_out <= 128, "too many aux channels for one output block"
    HI = jax.lax.Precision.HIGHEST

    def kernel(ri_ref, cj_ref, pwt_ref, ovt_ref, out_ref):
        bi = pl.program_id(0)

        def irow(k):                  # (1, BI) broadcast row of side i
            return ri_ref[k:k + 1, :]

        def jcol(k):                  # (n_pad, 1) broadcast column of side j
            return cj_ref[:, k:k + 1]

        dx = irow(0) - jcol(0)
        dy = irow(1) - jcol(1)
        dz = irow(2) - jcol(2)
        d2 = dx * dx + dy * dy + dz * dz               # exact f32, no MXU
        rs = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
        dist = d2 * rs
        rowj = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
        coli = (jax.lax.broadcasted_iota(jnp.int32, (1, BI), 1) + bi * BI)
        dist = jnp.where(rowj == coli, CENTRAL_SENTINEL, dist)

        Si = {f: irow(3 + k) for k, f in enumerate(cf.fields)}
        Sj = {f: jcol(3 + k) for k, f in enumerate(cf.fields)}
        ch, base = {}, 3 + n_f
        for name, kb in zip(bil_names, arities):
            ch[name] = sum(irow(base + k) * jcol(base + k)
                           for k in range(kb))
            base += kb

        w = jnp.broadcast_to(cf.coef(dist, Si, Sj, **ch), (n_pad, BI))
        f = jnp.broadcast_to(fr_coef(dist, Si, Sj), (n_pad, BI))
        FwT = jax.lax.dot_general(
            pwt_ref[...], w, (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32)  # (8, BI)
        FvT = jax.lax.dot_general(
            ovt_ref[...], f, (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32)
        rows = [irow(0) * FwT[3:4, :] - FwT[0:1, :],
                irow(1) * FwT[3:4, :] - FwT[1:2, :],
                irow(2) * FwT[3:4, :] - FwT[2:3, :],
                FvT[3:4, :], FvT[0:1, :], FvT[1:2, :], FvT[2:3, :]]
        for k in aux_keys:
            g = jnp.broadcast_to(cf.aux[k](dist, Si, Sj, **ch),
                                 (n_pad, BI))
            rows.append(jnp.sum(g, axis=0, keepdims=True))
        acc = jnp.zeros((NO, BI), jnp.float32)
        srow = jax.lax.broadcasted_iota(jnp.int32, (NO, 1), 0)
        for r, v in enumerate(rows):
            acc = acc + jnp.where(srow == r, v, 0.0)
        out_ref[...] = acc

    blk = lambda r: pl.BlockSpec((r, BI), lambda bi: (0, bi),
                                 memory_space=pltpu.VMEM)
    full = lambda r, c: pl.BlockSpec((r, c), lambda bi: (0, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[blk(KI), full(n_pad, KI), full(8, n_pad),
                  full(8, n_pad)],
        out_specs=blk(NO),
        out_shape=jax.ShapeDtypeStruct((NO, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * n_pad * (24 + 2 * sum(arities)),
            transcendentals=n_pad * n_pad,
            bytes_accessed=n_pad * KI * 8 + n_pad * NO * 4),
        interpret=_interpret(),
    )(Ri, Cj, PwT, OvT)

    zero = jnp.zeros((n_pad,), jnp.float32)
    vals = {"x": out[0], "y": out[1], "z": out[2]}
    F = cf.Pt(**{f: vals.get(f, zero) for f in cf.Pt._fields})
    sum_f = out[3]
    sum_v = (out[4], out[5], out[6])
    aux = {k: out[7 + i] for i, k in enumerate(aux_keys)}

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
