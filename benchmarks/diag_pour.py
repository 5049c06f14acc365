"""TPU timing: lattice_build with the butterfly pour kernel vs scatters."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from yalla_tpu.dtypes import Float3
from yalla_tpu.models import branching as B
from yalla_tpu.ops.lattice_xla import lattice_build

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
gs, C, cube = 64, 8, 1.1
n_pad = -(-n_cells // 4096) * 4096
rng = np.random.default_rng(0)
side = int(np.ceil((n_cells * 6 / np.pi) ** (1 / 3))) + 2
g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), -1).reshape(-1, 3)
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
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    print(f"{name}: {(time.perf_counter()-t0)/reps*1000:.1f} ms", flush=True)
    return out

for ec in (0, 2048):
    a = timeit(f"build scatter (extras={ec})",
               jax.jit(lambda X, ov, ec=ec: lattice_build(X, ov, n, cube, gs, C, ec)), X, ov)
    b = timeit(f"build POUR    (extras={ec})",
               jax.jit(lambda X, ov, ec=ec: lattice_build(X, ov, n, cube, gs, C, ec, pallas_pour=True)), X, ov)
    eq = all(bool(jnp.array_equal(x, y)) for x, y in
             zip(jax.tree.leaves((a.T, a.Tov, a.pid)), jax.tree.leaves((b.T, b.Tov, b.pid))))
    print(f"  exact equal: {eq}  dropped {int(a.n_dropped)}=={int(b.n_dropped)}", flush=True)
