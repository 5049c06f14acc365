"""Split the flagship frame cost: heun vs proliferate/lineage vs host I/O.

The round-4 flagship run (500 frames, final n=157k) showed a ~2.5-3
s/frame floor independent of live n -- measured BEFORE capacity-tier
scheduling landed (every frame paid the 500k-padded engine).  This
measures where each frame goes under the tier-scheduled loop the
example actually runs now: at the seed state on its own tier and at a
late-run population on the final tier.

Round-5 measurement (one v5e chip via tunnel, tiers 4096 / 262144),
under the division-regime engine presets (occupancy floor 15 -> C=14 at
the 262144 tier; the earlier C=8-preset numbers in git history measured
858.9 ms/frame but hit 8 reactive resize+recompile cycles over a full
run):

  [n=500 seed]  frame  110.6 ms | heun-only(11)  346.3 ms | prolif  74.9 ms
  [n=150000]    frame 1615.2 ms | heun-only(11) 2052.3 ms | prolif 117.2 ms
  write 6 arrays/frame: 449 ms sync / 767 ms via the async worker
  (pull+format with no compute to hide behind), errs readback 31 ms

i.e. the floor was the un-tiered engine, not dispatch or I/O: late
frames are ~1.6 s of device compute -- BELOW the 11-substep heun-only
kernel-rate measurement at this tier (the fused frame scan overlaps
better than the separately-jitted heun loop) -- plus a ~0.5-0.8 s host
transfer+write that the async worker overlaps with the next frame's
compute.  The C=14 division-regime capacity is the remaining premium
over the settled-bench C=8 plan (~1.9x modelled lane work), paid to
keep a GROWING tissue resize-free: the round-5 end-to-end run holds
~1 s/frame mid-run and finished 500 frames with ZERO reactive resizes
(BASELINE.md row).

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


def _late_state(n_late, tier, p, engine):
    """Late-run population on the final tier WITHOUT a 150k relaxation
    (the relaxed_sphere path at this size is minutes of device work and
    has crashed the tunnel worker): take the innermost ``n_late`` cells
    of the committed settled 500k bench state (a compact ball in the
    same force regime) and pad to the tier."""
    from bench import _load_settled
    from yalla_tpu.dtypes import Float3
    from yalla_tpu.growth import lineage_init
    from yalla_tpu.solvers import Solution

    cached = _load_settled("branching", 500_000, 0, B.Cell)
    assert cached is not None, "run bench.py once to build the cache"
    Xc, _ = cached
    h = {f: np.asarray(getattr(Xc, f)) for f in B.Cell._fields}
    rr = h["x"] ** 2 + h["y"] ** 2 + h["z"] ** 2
    rr[500_000:] = np.inf
    keep = np.argsort(rr)[:n_late]
    cells = Solution(B.Cell, tier, engine=engine, cube_size=p.r_max)
    n_pad = cells.n_pad
    arrs = {f: np.zeros(n_pad, np.float32) for f in B.Cell._fields}
    for f in B.Cell._fields:
        arrs[f][:n_late] = h[f][keep]
    X = B.Cell(**{f: jnp.asarray(a) for f, a in arrs.items()})
    return B.State(X=X, old_v=Float3.zeros(n_pad), n=jnp.int32(n_late),
                   lineage=lineage_init(2 * n_pad, n_pad, n_late),
                   epi_nbs=jnp.zeros(n_pad), mes_nbs=jnp.zeros(n_pad),
                   key=jax.random.PRNGKey(7)), cells


def main():
    n_max = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_late = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
    p = B.Params()
    # mirror the tier-scheduled flagship loop (examples/branching.py):
    # the seed runs on the SMALLEST sufficient tier, not the 500k engine
    tier0 = B.next_tier(500, n_max)
    t0 = time.perf_counter()
    state, cells, engine = B.init_state(500, tier0, p, seed=42)
    print(f"init: {time.perf_counter()-t0:.1f}s tier={tier0} "
          f"engine={engine}", flush=True)
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
                jnp.int32(0), None, B.precompute)
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

    # late-run population on the FINAL tier (the regime the recorded
    # ~2.5-3 s/frame floor was measured in)
    tier_late = B.next_tier(n_late, n_max)
    engine_late = B.default_engine(tier_late, tier_late, p)
    t0 = time.perf_counter()
    state2, cells2 = _late_state(n_late, tier_late, p, engine_late)
    print(f"late init: {time.perf_counter()-t0:.1f}s tier={tier_late} "
          f"engine={engine_late}", flush=True)
    frame_late = B.make_frame(p, engine_late, substeps=11)

    @jax.jit
    def heun_late(X, old_v, n, key):
        def body(carry, _):
            X, old_v = carry
            X, old_v, aux = heun_step(
                engine_late, force, B.friction_w_neighbour, None, "com",
                X, old_v, n, jnp.float32(p.dt), jnp.float32(p.r_max),
                jnp.int32(0), None, B.precompute)
            return (X, old_v), None
        (X, old_v), _ = jax.lax.scan(body, (X, old_v), None, length=11)
        return X, old_v

    t_frame = timeit(lambda s: frame_late(s, jnp.float32(0.5))[0].X.x,
                     state2)
    t_heun = timeit(heun_late, state2.X, state2.old_v, state2.n, state2.key)
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
    st, errs = frame_late(state2, jnp.float32(0.5))
    jax.block_until_ready(st.n); np.asarray(st.n)
    t0 = time.perf_counter()
    for _ in range(3):
        any(float(v) for k, v in errs.items() if k != "__err_cells_lost")
    print(f"errs readback (already-computed dict): "
          f"{(time.perf_counter()-t0)/3*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
