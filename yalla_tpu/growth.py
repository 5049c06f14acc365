"""Proliferation (dynamic N) and lineage tracing as framework features.

The reference implements cell division per model with ``atomicAdd`` slot
allocation (e.g. ``examples/branching.cu:113-170``, ``passive_growth.cu:
60-91``): thread i draws a uniform, applies gates, claims slot
``n = atomicAdd(d_n_cells, 1)``, places the daughter at the parent plus a
random ``mean_distance / 4`` offset, halves conserved fields, and copies
``d_old_v``.  Newborn cells are protected from dividing by the guard
``i >= n * (1 - rate)``.

TPU-native translation: capacity is static; a boolean *division mask* is
turned into daughter slots by an exclusive prefix sum (replacing the atomic
counter -- birth order differs from the reference, which is fine because the
reference itself is nondeterministic through atomics and time-seeded RNG),
and daughters are written with out-of-range-dropping scatters.  The whole
update is one pure jitted function of (X, old_v, n, key); growth never
recompiles.

Lineage tracing (``branching.cu:46-55, 154-169``) records a tree node per
division into preallocated arrays with its own prefix-sum-allocated counter.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .dtypes import Float3

__all__ = ["proliferate", "DivisionInfo", "Lineage", "lineage_init",
           "record_divisions"]


class DivisionInfo(NamedTuple):
    ok: jnp.ndarray         # bool[n_pad]: cell i divided this call
    child_idx: jnp.ndarray  # int32[n_pad]: daughter slot (valid where ok)
    n_divided: jnp.ndarray  # int32 scalar
    n_lost: jnp.ndarray     # int32 scalar: divisions dropped at capacity
    #                         (the reference hard-asserts instead,
    #                          solvers.cuh:82; callers must check)


def _random_unit(key, n_pad):
    """Uniform directions via the reference's own parameterization
    (theta = acos(2u - 1), phi = 2 pi u; branching.cu:141-143)."""
    k1, k2 = jax.random.split(key)
    theta = jnp.arccos(2.0 * jax.random.uniform(k1, (n_pad,)) - 1.0)
    phi = jax.random.uniform(k2, (n_pad,)) * (2.0 * jnp.pi)
    return Float3(x=jnp.sin(theta) * jnp.cos(phi),
                  y=jnp.sin(theta) * jnp.sin(phi),
                  z=jnp.cos(theta))


@partial(jax.jit, static_argnums=(0, 1))
def proliferate(want_fn, child_fn, X, old_v, n, key, props=()):
    """One division pass.

    want_fn(X, props, rnd, i, n) -> bool[n_pad]
        division decision per cell; ``rnd`` is a fresh uniform [n_pad].
        Apply rate gates / newborn guards here (cf. branching.cu:118-137).
    child_fn(X, props, direction, i) -> (X_parent, X_child)
        how fields split between parent and daughter; ``direction`` is a
        random unit Float3 per cell (scale it by mean_distance / 4 to match
        the reference placement).
    props: tuple of int/float arrays copied parent -> daughter verbatim.

    Returns (X', old_v', n', props', DivisionInfo).
    """
    n_pad = X.x.shape[0]
    i = jnp.arange(n_pad, dtype=jnp.int32)
    active = i < n
    k_rnd, k_dir = jax.random.split(key)
    rnd = jax.random.uniform(k_rnd, (n_pad,))
    want = want_fn(X, props, rnd, i, n) & active

    offs = jnp.cumsum(want.astype(jnp.int32))
    child_idx = n + offs - 1
    ok = want & (child_idx < n_pad)
    # scatter target: out-of-range for non-dividing cells -> dropped
    tgt = jnp.where(ok, child_idx, n_pad)

    direction = _random_unit(k_dir, n_pad)
    X_parent, X_child = child_fn(X, props, direction, i)

    def place(cur, parent_new, child):
        cur = jnp.where(ok, parent_new, cur)
        return cur.at[tgt].set(child, mode="drop")

    X_new = jax.tree.map(place, X, X_parent, X_child)
    old_v_new = jax.tree.map(
        lambda a: a.at[tgt].set(a, mode="drop"), old_v)
    # scalars pass through untouched (e.g. dynamic rates for want_fn)
    props_new = tuple(p if jnp.ndim(p) == 0 else p.at[tgt].set(p, mode="drop")
                      for p in props)
    n_divided = jnp.sum(ok.astype(jnp.int32))
    n_lost = jnp.sum(want.astype(jnp.int32)) - n_divided
    return (X_new, old_v_new, n + n_divided, props_new,
            DivisionInfo(ok=ok, child_idx=child_idx, n_divided=n_divided,
                         n_lost=n_lost))


# --------------------------------------------------------------------------
# Lineage tracing (ref branching.cu:46-55, 154-169, 283-339)
# --------------------------------------------------------------------------

class Lineage(NamedTuple):
    """Preallocated tree-node arrays + per-cell parent/clone labels."""
    n_nodes: jnp.ndarray        # int32 scalar
    node_x: jnp.ndarray         # f32[cap]
    node_y: jnp.ndarray
    node_z: jnp.ndarray
    node_time: jnp.ndarray      # f32[cap]
    node_parent: jnp.ndarray    # int32[cap]
    node_clone: jnp.ndarray     # int32[cap]
    node_type: jnp.ndarray      # int32[cap]
    cell_parent: jnp.ndarray    # int32[n_pad], -1 = root
    cell_clone: jnp.ndarray     # int32[n_pad]


def lineage_init(cap, n_pad, n_0):
    """Founders get clone id i + 1 and no parent (branching.cu:222-228)."""
    i = jnp.arange(n_pad, dtype=jnp.int32)
    return Lineage(
        n_nodes=jnp.int32(0),
        node_x=jnp.zeros(cap, jnp.float32),
        node_y=jnp.zeros(cap, jnp.float32),
        node_z=jnp.zeros(cap, jnp.float32),
        node_time=jnp.zeros(cap, jnp.float32),
        node_parent=jnp.full(cap, -1, jnp.int32),
        node_clone=jnp.zeros(cap, jnp.int32),
        node_type=jnp.zeros(cap, jnp.int32),
        cell_parent=jnp.full(n_pad, -1, jnp.int32),
        cell_clone=jnp.where(i < n_0, i + 1, 0),
    )


@jax.jit
def record_divisions(lin: Lineage, info: DivisionInfo, X, cell_type,
                     time_progression):
    """Append one internal node per division; relabel parent + daughter
    (branching.cu:154-169)."""
    cap = lin.node_x.shape[0]
    offs = jnp.cumsum(info.ok.astype(jnp.int32))
    node_idx = lin.n_nodes + offs - 1
    tgt = jnp.where(info.ok, node_idx, cap)  # drop non-divisions

    set_ = lambda arr, val: arr.at[tgt].set(val, mode="drop")
    ctgt = jnp.where(info.ok, info.child_idx, lin.cell_parent.shape[0])
    new = lin._replace(
        n_nodes=lin.n_nodes + jnp.sum(info.ok.astype(jnp.int32)),
        node_x=set_(lin.node_x, X.x),
        node_y=set_(lin.node_y, X.y),
        node_z=set_(lin.node_z, X.z),
        node_time=set_(lin.node_time,
                       jnp.full_like(lin.node_time[0], time_progression)),
        node_parent=set_(lin.node_parent, lin.cell_parent),
        node_clone=set_(lin.node_clone, lin.cell_clone),
        node_type=set_(lin.node_type, cell_type),
        cell_clone=lin.cell_clone.at[ctgt].set(lin.cell_clone, mode="drop"),
        cell_parent=jnp.where(info.ok, node_idx, lin.cell_parent)
        .at[ctgt].set(jnp.where(info.ok, node_idx, lin.cell_parent),
                      mode="drop"),
    )
    return new
