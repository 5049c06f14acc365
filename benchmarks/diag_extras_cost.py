"""Extras-sidecar cap vs pass time at the settled 500k state.

The certified 500k plan runs C=8 with overflow extras (119 spilled
cells) and a per-block sidecar cap of 32; the planner's cost model
charges ~2.2 force evals per table slot, i.e. the sidecar is
2.2*32 / (9*(4C-1)) ~= 25% of the modelled lane work.  The cap is
sized as max(2*measured_spill, spill+6, 8) rounded up to 8 -- generous
headroom against density drift during the timed window.  This measures
what a tighter cap would actually buy (and whether the probe flags it),
racing e_b in {32, 24, 16} on the committed settled state at the
winning per-pass-rebuild cadence.

OUTCOME (round 5): superseded by the bench's own tight-extras rungs
(bench.py measure(), loosest cap first) -- e_b=24 certified at
4.69-4.72e6 cell-steps/s (+2-3% over the 32-cap plan) and is the
persisted 500k winner (bench_state.json); e_b=16 honestly flags
(__err_extras_block: 11 -- mid-window density drift pushes some
block's spill past 16).  Kept for one-off re-measurement.

Run on the TPU host: python benchmarks/diag_extras_cost.py [n_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from bench import _prepare_branching, E_CAP
    from yalla_tpu.ops.common import friction_w_neighbour
    from yalla_tpu.ops.lattice_xla import lattice_heun_steps
    from yalla_tpu.polarity import polarity_precompute3

    n_cells = 500_000
    X, old_v, p, force, n, pallas = _prepare_branching(n_cells)
    gs, C = (64, 64, 64), 8

    for e_b in (32, 24, 16):
        def run():
            return lattice_heun_steps(
                n_steps, 1, force, friction_w_neighbour, "com", gs, C, 2,
                X, old_v, n, jnp.float32(p.dt), jnp.float32(p.r_max),
                jnp.int32(0), polarity_precompute3, pallas, None, None,
                jnp.float32(p.r_max), E_CAP, e_b, 0, False, 0.0, 1)

        out = run()
        _ = float(np.asarray(out[0].x)[0])
        aux = out[2]
        fired = {k: float(np.max(np.asarray(v))) for k, v in aux.items()
                 if k.startswith("__err") and float(np.max(np.asarray(v)))}
        if fired:
            print(f"e_b={e_b}: probe flagged {fired}", flush=True)
            continue
        t0 = time.perf_counter()
        out = run()
        _ = float(np.asarray(out[0].x)[0])
        dt = time.perf_counter() - t0
        print(f"e_b={e_b}: {dt / n_steps * 1e3:7.1f} ms/step "
              f"({n_cells * n_steps / dt:.4g} cell-steps/s), flags clean",
              flush=True)


if __name__ == "__main__":
    main()
