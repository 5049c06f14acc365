"""Split the flagship frame cost: heun vs proliferate/lineage vs host I/O.

The recorded flagship run (500 frames, final n=157k) showed a ~2.5-3
s/frame floor independent of live n and a marginal slope ~5x worse than
the bench kernel.  This measures where each frame goes, at the seed
state (n=500) and at a late-run population, with the exact engine the
flagship uses (models.branching.default_engine sized for n_max=500k).

Usage: python benchmarks/diag_flagship.py [n_max] [n_late]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from yalla_tpu.models import branching as B
from yalla_tpu.solvers import heun_step
from yalla_tpu.growth import proliferate, record_divisions
from functools import partial


def timeit(fn, *args, reps=3, warm=1, **kw):
    for _ in range(warm):
        r = fn(*args, **kw)
        jax.tree.map(lambda a: np.asarray(a).ravel()[:1], r)  # force through tunnel
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args, **kw)
        jax.tree.map(lambda a: np.asarray(a).ravel()[:1], r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n_max = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_late = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
    p = B.Params()
    t0 = time.perf_counter()
    state, cells, engine = B.init_state(500, n_max, p, seed=42)
    print(f"init: {time.perf_counter()-t0:.1f}s engine={engine}", flush=True)
    frame = B.make_frame(p, engine, substeps=11)

    force = B.make_force(p)
    want = B.make_want_fn(p)
    child = B.make_child_fn(p)

    @jax.jit
    def heun_only(X, old_v, n, key):
        def body(carry, _):
            X, old_v = carry
            X, old_v, aux = heun_step(
                engine, force, B.friction_w_neighbour, None, "com",
                X, old_v, n, jnp.float32(p.dt), jnp.float32(p.r_max),
                jnp.int32(0), None, B.polarity_precompute)
            return (X, old_v), None
        (X, old_v), _ = jax.lax.scan(body, (X, old_v), None, length=11)
        return X, old_v

    @jax.jit
    def prolif_only(state):
        def body(carry, key):
            X, old_v, n, lin, epi, mes = carry
            X, old_v, n, (epi, mes), info = proliferate(
                want, child, X, old_v, n, key, props=(epi, mes))
            lin = record_divisions(lin, info, X, X.ctype.astype(jnp.int32),
                                   jnp.float32(0.5))
            return (X, old_v, n, lin, epi, mes), None
        keys = jax.random.split(state.key, 11)
        carry = (state.X, state.old_v, state.n, state.lineage,
                 state.epi_nbs, state.mes_nbs)
        carry, _ = jax.lax.scan(body, carry, keys)
        return carry[0].x, carry[2], carry[3].n_nodes

    for label, st in [("n=500 seed", state)]:
        t_frame = timeit(lambda s: frame(s, jnp.float32(0.5))[0].X.x, st)
        t_heun = timeit(heun_only, st.X, st.old_v, st.n, st.key)
        t_prol = timeit(prolif_only, st)
        print(f"[{label}] frame {t_frame*1e3:8.1f} ms | heun-only(11) "
              f"{t_heun*1e3:8.1f} ms | prolif-only(11) {t_prol*1e3:8.1f} ms",
              flush=True)

    # late-run population: grow a relaxed ball at n_late on the same engine
    t0 = time.perf_counter()
    state2, cells2, _ = B.init_state(n_late, n_max, p, seed=7, engine=engine)
    print(f"late init: {time.perf_counter()-t0:.1f}s", flush=True)
    t_frame = timeit(lambda s: frame(s, jnp.float32(0.5))[0].X.x, state2)
    t_heun = timeit(heun_only, state2.X, state2.old_v, state2.n, state2.key)
    t_prol = timeit(prolif_only, state2)
    print(f"[n={n_late}] frame {t_frame*1e3:8.1f} ms | heun-only(11) "
          f"{t_heun*1e3:8.1f} ms | prolif-only(11) {t_prol*1e3:8.1f} ms",
          flush=True)

    # host-side per-frame I/O cost (6 arrays, async off vs on)
    from yalla_tpu import Property
    from yalla_tpu.vtkio import Vtk_output
    import shutil
    ctype = Property(cells2.n_pad, "type")
    clone = Property(cells2.n_pad, "cell_clone")
    for async_write in (False, True):
        t0 = time.perf_counter()
        with Vtk_output("diagf", output_path="/tmp/diagf", verbose=False,
                        async_write=async_write) as out:
            for _ in range(3):
                cells2.d_X, cells2.d_old_v, cells2.d_n = \
                    state2.X, state2.old_v, state2.n
                out.write_positions(cells2)
                out.write_polarity(cells2)
                out.write_field(cells2, "u")
                out.write_field(cells2, "v")
                ctype.d_prop = state2.X.ctype.astype(jnp.int32)
                clone.d_prop = state2.lineage.cell_clone
                out.write_property(ctype)
                out.write_property(clone)
        dt = (time.perf_counter() - t0) / 3
        print(f"[n={n_late}] write 6 arrays/frame, async={async_write}: "
              f"{dt*1e3:.0f} ms/frame", flush=True)
    shutil.rmtree("/tmp/diagf", ignore_errors=True)

    # errs readback pattern from examples/branching.py (one float() per key)
    st, errs = frame(state2, jnp.float32(0.5))
    jax.block_until_ready(st.n); np.asarray(st.n)
    t0 = time.perf_counter()
    for _ in range(3):
        any(float(v) for k, v in errs.items() if k != "__err_cells_lost")
    print(f"errs readback (already-computed dict): "
          f"{(time.perf_counter()-t0)/3*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
