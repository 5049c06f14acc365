"""Sub-phase isolation of gabriel_windowed at 100k: where do the ms go?"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from yalla_tpu.dtypes import Float3
from yalla_tpu.ops.grid_xla import build_grid, _row_offsets, _block_size

n_cells = 100_000
n_pad = -(-n_cells // 4096) * 4096
rng = np.random.default_rng(0)
side = int(np.ceil((2 * n_cells) ** (1 / 3)))
g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), -1).reshape(-1, 3)
pos = (g - side / 2) * 0.75 + rng.uniform(-0.2, 0.2, (len(g), 3))
pos = pos[pos[:, 2] > 0.2][:n_pad - 1].astype(np.float32)
P = np.zeros((n_pad, 3), np.float32); P[1:1 + len(pos)] = pos
X = Float3(x=jnp.asarray(P[:, 0]), y=jnp.asarray(P[:, 1]), z=jnp.asarray(P[:, 2]))
ov = Float3.zeros(n_pad)
n = jnp.int32(min(n_cells, len(pos) + 1))
r_max = 1.0
gs = 64

def timeit(name, fn, reps=3):
    out = jax.jit(fn)()
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.jit(fn)()
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    print(f"{name}: {(time.perf_counter()-t0)/reps*1000:.0f} ms", flush=True)

def phase(stop, ib=128, Wr=64, NC=32, sub=16):
    B = _block_size(n_pad, ib); g_ = sub; G = B // g_
    def f():
        tables = build_grid(X, n, jnp.float32(r_max), gs)
        if stop == "build":
            return tables.order
        leaves_X, tree_X = jax.tree.flatten(X)
        order = tables.order
        srt = jnp.stack([a[order] for a in leaves_X]
                        + [ov.x[order], ov.y[order], ov.z[order]]
                        + [tables.cid[order].astype(jnp.float32),
                           (order < n).astype(jnp.float32)])
        K = srt.shape[0]
        offs = _row_offsets(gs); n_cubes = gs ** 3
        def eval_block(b0):
            blk = jax.lax.dynamic_slice(srt, (0, b0), (K, B))
            cid_i = blk[K - 2].astype(jnp.int32); act_i = blk[K - 1] > 0.5
            qc = jnp.clip(cid_i[:, None, None] + offs[None], 0, n_cubes - 1)
            rs = jnp.min(tables.cube_start[qc], axis=2)
            re = jnp.max(tables.cube_end[qc], axis=2)
            rs_g = rs.reshape(G, g_, 9); re_g = re.reshape(G, g_, 9)
            act_g = act_i.reshape(G, g_)
            nonempty = act_g[:, :, None] & (rs_g <= re_g)
            rs_f = jnp.where(nonempty, rs_g, n_pad)
            re_f = jnp.where(nonempty, re_g, n_pad)
            mid_r = (jnp.maximum(jnp.sum(nonempty, axis=1) - 1, 0) // 2)[:, None]
            rs_med = jnp.take_along_axis(jnp.sort(rs_f, axis=1), mid_r, axis=1)[:, 0]
            re_med = jnp.take_along_axis(jnp.sort(re_f, axis=1), mid_r, axis=1)[:, 0]
            w0 = jnp.clip((rs_med + re_med - Wr) // 2, 0, n_pad - Wr)
            row_empty = rs_g > re_g
            fit_g = jnp.all(row_empty | ((rs_g >= w0[:, None])
                                         & (re_g <= w0[:, None] + (Wr - 1))), axis=2) & act_g
            def row_win(r):
                return jax.vmap(lambda s: jax.lax.dynamic_slice(srt, (0, s), (K, Wr)))(w0[:, r])
            win = jnp.stack([row_win(r) for r in range(9)], axis=1)
            if stop == "win":
                return jnp.sum(win), jnp.sum(fit_g)
            wpos = w0[:, :, None] + jnp.arange(Wr, dtype=jnp.int32)[None, None]
            valid = ((wpos[:, None] >= rs_g[..., None]) & (wpos[:, None] <= re_g[..., None])
                     & (win[:, None, :, K - 1] > 0.5))
            xj = win[:, None, :, 0]; yj = win[:, None, :, 1]; zj = win[:, None, :, 2]
            Xi = jax.tree.unflatten(tree_X, list(blk[:3]))
            Xi_g = jax.tree.map(lambda a: a.reshape(G, g_)[..., None, None], Xi)
            dist = jnp.sqrt((Xi_g.x - xj) ** 2 + (Xi_g.y - yj) ** 2 + (Xi_g.z - zj) ** 2)
            cand = valid & (dist < r_max) & fit_g[..., None, None]
            if stop == "dist":
                return jnp.sum(dist), jnp.sum(cand)
            key = jnp.where(cand, dist, jnp.inf).reshape(B, 9 * Wr)
            _, sel = jax.lax.top_k(-key, NC)
            if stop == "topk":
                return jnp.sum(sel)
            take = lambda a: jnp.take_along_axis(
                jnp.broadcast_to(a, (G, g_, 9, Wr)).reshape(B, 9 * Wr), sel, axis=1)
            cand_s = jnp.take_along_axis(cand.reshape(B, 9 * Wr), sel, axis=1)
            dist_s = jnp.take_along_axis(dist.reshape(B, 9 * Wr), sel, axis=1)
            xj_s, yj_s, zj_s = take(xj), take(yj), take(zj)
            if stop == "take":
                return jnp.sum(xj_s) + jnp.sum(dist_s), jnp.sum(cand_s)
            mx = (Xi.x[:, None] + xj_s) * 0.5; my = (Xi.y[:, None] + yj_s) * 0.5
            mz = (Xi.z[:, None] + zj_s) * 0.5
            d2 = ((mx[:, :, None] - xj_s[:, None, :]) ** 2
                  + (my[:, :, None] - yj_s[:, None, :]) ** 2
                  + (mz[:, :, None] - zj_s[:, None, :]) ** 2)
            radius2 = (0.5 * dist_s * 0.8) ** 2
            blocked = jnp.any(cand_s[:, None, :] & (d2 < radius2[:, :, None]), axis=2)
            keep = cand_s & ~blocked
            return jnp.sum(keep.astype(jnp.float32) * dist_s), jnp.sum(keep)
        starts = jnp.arange(n_pad // B, dtype=jnp.int32) * B
        _, outs = jax.lax.scan(lambda c, s: (c, eval_block(s)), None, starts)
        return outs
    return f

for stop in ("build", "win", "dist", "topk", "take", "mid"):
    timeit(f"phase<={stop}", phase(stop))
for stop in ("take", "mid"):
    timeit(f"phase<={stop} NC=16", phase(stop, NC=16))
