"""Sorted-window neighbour engine: the TPU performance path.

Same physics as the spatial-hash grid engine (``grid_xla.py``, rebuilding
``Grid_computer`` semantics from ``/root/reference/include/solvers.cuh:
345-502``), reorganized for TPU memory behaviour.

Why: XLA:TPU arbitrary gathers run at ~1e8 elements/s, and the gather-based
grid engine moves ~300 gathered elements per cell per pass -- it is
gather-bound by two orders of magnitude.  This engine eliminates gathers
from the force pass entirely:

1. points are sorted by cube id once per pass; *all per-cell fields are
   permuted into sorted order* (one gather per field per pass, amortizable
   with a rebuild cadence);
2. for a block of B consecutive sorted points spanning cubes
   ``[c_first, c_last]``, the candidates of neighbour row o (one of the 9
   (dy, dz) offsets; the 3 x-cubes of a row have consecutive ids) occupy
   ONE contiguous span of the sorted order:
   ``[searchsorted(c_first + o - 1), searchsorted(c_last + o + 2))``;
3. the force pass therefore reads 9 *dynamic slices* per block -- plain
   contiguous loads -- and evaluates a dense ``[B, Wmax]`` pair block per
   row, masked by cube-id arithmetic ``|cid_j - (cid_i + o)| <= 1`` plus
   the ``dist < cube_size`` cutoff (ref solvers.cuh:450).

Stable cell ids are carried through the sort so force functions still see
the reference's ``(i, j)`` indices; results are scattered back to stable
order (unique-index scatter, fast on TPU).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import evaluate_pairs

__all__ = ["WindowData", "window_build", "window_pairwise",
           "window_overflow"]

_ROWS = [(dz, dy) for dz in (-1, 0, 1) for dy in (-1, 0, 1)]


class WindowData(NamedTuple):
    order: jnp.ndarray       # int32[n_pad]: stable id per sorted slot
    sorted_cid: jnp.ndarray  # int32[n_pad]
    ws: jnp.ndarray          # int32[n_blocks, 9]: window starts
    we: jnp.ndarray          # int32[n_blocks, 9]: window ends (exclusive)


from .common import cube_ids as _cube_ids


def window_build(X, n, cube_size, grid_size, block):
    """Sort by cube id and compute per-block row windows."""
    n_pad = X.x.shape[0]
    cid = _cube_ids(X, n, cube_size, grid_size)
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    sorted_cid, order = jax.lax.sort((cid, iota), num_keys=1)

    nb = n_pad // block
    c_first = sorted_cid.reshape(nb, block)[:, 0]
    c_last = sorted_cid.reshape(nb, block)[:, -1]
    gs = grid_size
    offs = jnp.asarray([dz * gs * gs + dy * gs for dz, dy in _ROWS],
                       jnp.int32)                               # [9]
    lo = c_first[:, None] + offs[None, :] - 1                    # [nb, 9]
    hi = c_last[:, None] + offs[None, :] + 2                     # exclusive
    ws = jnp.searchsorted(sorted_cid, lo, side="left").astype(jnp.int32)
    we = jnp.searchsorted(sorted_cid, hi, side="left").astype(jnp.int32)
    return WindowData(order, sorted_cid, ws, we)


def window_overflow(data: WindowData, w_max, n=None):
    """True if any block-row window drops a *real* candidate at capacity
    ``w_max``.  Sentinel (padded) slots sort past every active cube, so
    spans reaching into the padded tail are not real drops: only
    candidates below ``n`` count (without this, any state with
    ``n_pad - n > w_max`` flags spuriously)."""
    n_pad = data.order.shape[0]
    hi = data.we if n is None else jnp.minimum(data.we, n)
    base = jnp.clip(data.ws, 0, max(n_pad - w_max, 0))
    return jnp.any(hi - base > w_max)


def window_pairwise(pw_int, pw_friction, X, old_v, n, cube_size, *,
                    grid_size=50, block=256, w_max=None,
                    grid_cube_size=None):
    """Pairwise sums over grid neighbours; results in stable-id order.

    ``grid_cube_size`` >= ``cube_size`` enables a Verlet-style skin: bin at
    the larger size so the same windows stay valid while points move less
    than the margin (the physics cutoff stays ``cube_size``).
    """
    n_pad = X.x.shape[0]
    if grid_cube_size is None:
        grid_cube_size = cube_size
    B = min(block, n_pad)
    while n_pad % B:
        B //= 2
    if w_max is None:
        w_max = 2 * B
    w_max = min(w_max, n_pad)
    data = window_build(X, n, grid_cube_size, grid_size, B)
    order, sorted_cid, ws, we = data
    gs = grid_size
    offs = [dz * gs * gs + dy * gs for dz, dy in _ROWS]

    # Permute all per-cell inputs into sorted order (the only gathers).
    S = jax.tree.map(lambda a: a[order], X)
    ov = (old_v.x[order], old_v.y[order], old_v.z[order])

    nb = n_pad // B

    def eval_block(b):
        s0 = b * B
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, s0, B)
        Xi = jax.tree.map(lambda a: sl(a)[:, None], S)
        ci = sl(sorted_cid)[:, None]                       # [B, 1]
        i_stable = sl(order)[:, None]
        active_i = (s0 + jnp.arange(B, dtype=jnp.int32))[:, None] < n

        acc = None
        for r in range(9):
            w0 = ws[b, r]
            wsl = lambda a: jax.lax.dynamic_slice_in_dim(
                a, jnp.clip(w0, 0, n_pad - w_max), w_max)
            base = jnp.clip(w0, 0, n_pad - w_max)
            Xj = jax.tree.map(lambda a: wsl(a)[None, :], S)
            ovj = tuple(w[None, :] for w in map(wsl, ov))
            cj = wsl(sorted_cid)[None, :]                  # [1, Wmax]
            j_stable = wsl(order)[None, :]
            pos = base + jnp.arange(w_max, dtype=jnp.int32)[None, :]
            in_window = (pos >= w0) & (pos < we[b, r])
            in_row = jnp.abs(cj - (ci + offs[r])) <= 1
            # pos < n: active points occupy sorted positions [0, n); without
            # this, stale coordinates in padded slots (sentinel cube id) can
            # match edge-cube rows and exert phantom forces
            pair_mask = in_window & in_row & active_i & (pos < n)
            out = evaluate_pairs(pw_int, pw_friction, Xi, Xj, ovj,
                                 i_stable, j_stable, pair_mask,
                                 sum_axes=(1,), cutoff=cube_size)
            if acc is None:
                acc = out
            else:
                F = jax.tree.map(jnp.add, acc[0], out[0])
                sum_f = acc[1] + out[1]
                sum_v = tuple(a + c for a, c in zip(acc[2], out[2]))
                aux = {k: acc[3][k] + out[3][k] for k in acc[3]}
                acc = (F, sum_f, sum_v, aux)
        # in-loop capacity check: flag only when a *real* (pos < n)
        # candidate falls outside the w_max slice -- spans that merely
        # reach into the sorted padded tail drop nothing
        hi = jnp.minimum(we[b], n)
        base_b = jnp.clip(ws[b], 0, max(n_pad - w_max, 0))
        over = jnp.any(hi - base_b > w_max).astype(jnp.float32)
        acc[3]["__err_grid_overflow"] = jnp.where(
            active_i[:, 0], over, 0.0)
        return acc

    if nb == 1:
        F, sum_f, sum_v, aux = eval_block(jnp.int32(0))
    else:
        _, outs = jax.lax.scan(
            lambda c, b: (c, eval_block(b)), None,
            jnp.arange(nb, dtype=jnp.int32))
        flat = lambda a: a.reshape((n_pad,) + a.shape[2:])
        F, sum_f, sum_v, aux = outs
        F = jax.tree.map(flat, F)
        sum_f = flat(sum_f)
        sum_v = tuple(map(flat, sum_v))
        aux = {k: flat(v) for k, v in aux.items()}

    # Back to stable-id order: unique-index scatter (fast on TPU).
    unsort = lambda a: jnp.zeros_like(a).at[order].set(a)
    return (jax.tree.map(unsort, F), unsort(sum_f),
            tuple(map(unsort, sum_v)), {k: unsort(v) for k, v in aux.items()})
