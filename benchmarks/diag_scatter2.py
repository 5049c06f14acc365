"""indices_are_sorted scatter/gather variants at 500k."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n_pad = 503808
gs, C = 64, 8
n_slots = gs ** 3 * C
rng = np.random.default_rng(0)
slot_sorted = jnp.asarray(np.sort(rng.choice(n_slots, n_pad, replace=False)).astype(np.int32))
vals = [jnp.asarray(rng.random(n_pad), jnp.float32) for _ in range(12)]

def timeit(name, fn, *args, reps=10):
    out = fn(*args); jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    print(f"{name}: {(time.perf_counter()-t0)/reps*1000:.1f} ms", flush=True)
    return out

@jax.jit
def scat_sorted(slot, vs):
    return [jnp.zeros(n_slots, jnp.float32).at[slot].set(
        v, mode="drop", unique_indices=True, indices_are_sorted=True)
        for v in vs]
o1 = timeit("scatter 12 f32 indices_are_sorted", scat_sorted, slot_sorted, tuple(vals))

@jax.jit
def scat_plain(slot, vs):
    return [jnp.zeros(n_slots, jnp.float32).at[slot].set(
        v, mode="drop", unique_indices=True) for v in vs]
o0 = timeit("scatter 12 f32 plain", scat_plain, slot_sorted, tuple(vals))
print("equal:", all(bool(jnp.array_equal(a,b)) for a,b in zip(o0,o1)), flush=True)

mono = jnp.asarray(np.sort(rng.choice(n_pad, n_pad)).astype(np.int32))
@jax.jit
def gath_sorted(idx, vs):
    return [jax.lax.gather(v, idx[:, None],
        jax.lax.GatherDimensionNumbers(offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,)),
        (1,), indices_are_sorted=True, unique_indices=False, mode=jax.lax.GatherScatterMode.CLIP) for v in vs]
timeit("gather 12 f32 indices_are_sorted", gath_sorted, mono, tuple(vals))

# add-scatter (histogram-style) with 12 channels for comparison
@jax.jit
def scat_add(slot, vs):
    return [jnp.zeros(n_slots, jnp.float32).at[slot].add(
        v, mode="drop", indices_are_sorted=True, unique_indices=True) for v in vs]
timeit("scatter-add 12 f32 sorted", scat_add, slot_sorted, tuple(vals))
