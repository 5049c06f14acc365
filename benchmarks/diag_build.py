"""Micro-benchmark the lattice build/unbuild machinery at 500k.

The staleness-certified cadence makes the rebuild the dominant cost
(diag_stale: pass ~30 ms at C=8+extras, build+unbuild ~128 ms/rebuild).
This isolates: the payload sort, the per-channel pour scatter, a stacked
row-scatter variant, the stacked column gather (unbuild), and a one-hot
MXU matmul variant of both.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from yalla_tpu.dtypes import Float3  # noqa: E402
from yalla_tpu.models import branching as B  # noqa: E402
from yalla_tpu.ops.lattice_xla import lattice_build, lattice_unbuild  # noqa: E402

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
gs, C = 64, 8
cube = 1.1
n_pad = -(-n_cells // 4096) * 4096
n_slots = gs ** 3 * C

rng = np.random.default_rng(0)
side = int(np.ceil((n_cells * 6 / np.pi) ** (1 / 3))) + 2
g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
             -1).reshape(-1, 3)
pos = (g - side / 2) * 0.75 + rng.uniform(-0.2, 0.2, (len(g), 3))
pos = pos[np.argsort(np.linalg.norm(pos, axis=1))][:n_pad]
pos[n_cells:] = 0.0
X = B.Cell(x=jnp.asarray(pos[:, 0], jnp.float32),
           y=jnp.asarray(pos[:, 1], jnp.float32),
           z=jnp.asarray(pos[:, 2], jnp.float32),
           theta=jnp.asarray(rng.random(n_pad), jnp.float32),
           phi=jnp.asarray(rng.random(n_pad), jnp.float32),
           u=jnp.asarray(rng.random(n_pad), jnp.float32),
           v=jnp.asarray(rng.random(n_pad), jnp.float32),
           ctype=jnp.zeros(n_pad, jnp.float32))
ov = Float3.zeros(n_pad)
n = jnp.int32(n_cells)


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # tunnel sync
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    _ = jax.tree.map(lambda a: a.block_until_ready(), out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name}: {dt:.1f} ms", flush=True)
    return out


build = jax.jit(lambda X, ov: lattice_build(X, ov, n, cube, gs, C, 2048))
lay = timeit("lattice_build (extras)", build, X, ov)
build0 = jax.jit(lambda X, ov: lattice_build(X, ov, n, cube, gs, C, 0))
lay0 = timeit("lattice_build (no extras)", build0, X, ov)
unbuild = jax.jit(lambda lay, X, ov: lattice_unbuild(lay, X, ov))
timeit("lattice_unbuild", unbuild, lay, X, ov)

# components
from yalla_tpu.ops.common import cube_ids  # noqa: E402

leaves = jax.tree.leaves(X) + jax.tree.leaves(ov)
K = len(leaves)
iota = jnp.arange(n_pad, dtype=jnp.int32)


@jax.jit
def sort_only(X, ov):
    cid = cube_ids(X, n, cube, gs)
    leaves = jax.tree.leaves(X) + jax.tree.leaves(ov)
    return jax.lax.sort((cid, iota, *leaves), num_keys=2)


sorted_all = timeit("payload sort (13 arrays)", sort_only, X, ov)
sorted_cid, order = sorted_all[0], sorted_all[1]
svals = list(sorted_all[2:])

first = jnp.concatenate([jnp.ones(1, bool), sorted_cid[1:] != sorted_cid[:-1]])
seg = jax.lax.cummax(jnp.where(first, iota, 0))
rank = iota - seg
ok = (rank < C) & (sorted_cid < gs ** 3)
slot_sorted = jnp.where(ok, sorted_cid * C + rank, n_slots)


@jax.jit
def pour_rows(slot_sorted, svals):
    return [jnp.zeros(n_slots, jnp.float32)
            .at[slot_sorted].set(v, mode="drop", unique_indices=True)
            for v in svals]


timeit("pour: 11 per-channel scatters", pour_rows, slot_sorted, tuple(svals))


@jax.jit
def pour_stacked(slot_sorted, svals):
    V = jnp.stack(svals, axis=-1)                     # [n_pad, K]
    out = jnp.zeros((n_slots + 1, K), jnp.float32) \
        .at[jnp.minimum(slot_sorted, n_slots)].set(
            V, mode="drop", unique_indices=True)
    return out[:n_slots]


timeit("pour: stacked [n_pad, K] row scatter", pour_stacked, slot_sorted,
       tuple(svals))


@jax.jit
def gather_cols(lay, svals):
    pick = jnp.minimum(lay.slot_of, n_slots - 1)
    G = jnp.stack(svals)[:, pick]
    return G


timeit("unbuild core: stacked column gather", gather_cols, lay0,
       tuple(svals))


@jax.jit
def gather_rows_stacked(lay, svals):
    pick = jnp.minimum(lay.slot_of, n_slots - 1)
    V = jnp.stack(svals, axis=-1)                     # [n_slots?, K]
    return V[pick]


# careful: svals are n_pad-sized; emulate slot->stable with slot-sized data
slot_vals = tuple(jnp.zeros(n_slots, jnp.float32) for _ in range(11))
timeit("unbuild core: stacked row gather", gather_rows_stacked, lay0,
       slot_vals)

# one-hot MXU variant: per (z, y) row, selection matmul
W = gs * C  # 512 lanes per row
rows = gs * gs


@jax.jit
def pour_onehot(slot_sorted, svals):
    # input run per output row: elements with slot in [r*W, (r+1)*W) are
    # contiguous in sorted order; find starts by searchsorted
    starts = jnp.searchsorted(slot_sorted, jnp.arange(rows) * W).astype(
        jnp.int32)
    V = jnp.stack(svals, axis=-1)                     # [n_pad, K]
    Vp = jnp.concatenate([V, jnp.zeros((W + 64, K))])
    sp = jnp.concatenate(
        [slot_sorted, jnp.full(W + 64, n_slots, jnp.int32)])

    def row(r0):
        def one(rr):
            s0 = starts[rr]
            w = jax.lax.dynamic_slice_in_dim(Vp, s0, W + 64)   # [W+64, K]
            sl = jax.lax.dynamic_slice_in_dim(sp, s0, W + 64) - rr * W
            sel = (sl[:, None] == jnp.arange(W)[None, :])      # [W+64, W]
            return jax.lax.dot_general(
                sel.astype(jnp.float32), w,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # [W, K]
        return jax.vmap(one)(r0)

    out = jax.lax.map(row, jnp.arange(rows).reshape(-1, 128), batch_size=1)
    return out.reshape(n_slots, K)


o1 = timeit("pour: one-hot MXU matmul", pour_onehot, slot_sorted,
            tuple(svals))
o2 = pour_stacked(slot_sorted, tuple(svals))
print("onehot == scatter:",
      bool(jnp.allclose(o1.reshape(n_slots, K), o2, atol=0, rtol=0)))
