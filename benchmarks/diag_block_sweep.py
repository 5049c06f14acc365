"""(z_block, y_block) sweep of the Pallas lattice kernel at settled 500k.

The kernel's Pallas grid is blocked (z_block x y_block) cube rows; the
defaults (2, 16) were chosen in round 3 from VMEM-fit and DMA-amortization
arguments but never swept on-device at the certified 500k state.  The
trade: bigger blocks amortize per-block DMA setup + i-buffer unpacking
over more rows, smaller blocks skip more of the empty corners of the
lattice box (the settled ball occupies ~40% of it) and keep the j-side
halo overhead (zb+2)(yb+2)/(zb*yb) higher.

Runs the certified winner plan (gs=64^3, C=8, extras 119/e_b 32, per-pass
rebuild) with each blocking; prints ms/step.  y_block is not part of the
engine surface (DEFAULT_Y_BLOCK is module state), so this monkeypatches
it around each build -- a diagnostic-only maneuver.

Round-5 result (one v5e chip, settled 500k state, 32 steps): the
default is already the optimum --

  zb=2 yb=16: 108.4 ms/step   zb=4 yb=16: 113.7 (+4.9%)
  zb=2 yb=8 : 108.4           zb=4 yb=8 : 113.0 (+4.2%)
  zb=2 yb=32: 109.0 (+0.6%)   zb=8 yb=16: flagged (__err_extras_block:
                              3 -- the per-block spill table aggregates
                              over the whole block; 8x16 rows collect
                              more than 32 spilled cells)

y-blocking is insensitive (halo amortization ~ cancels skip
granularity); z-blocks beyond 2 lose real skip granularity on the ball.
RACE CLOSED: (2, 16) stays the default.

Usage (TPU host): python benchmarks/diag_block_sweep.py [n_steps]
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
    from yalla_tpu.ops import lattice_pallas
    from yalla_tpu.ops.common import friction_w_neighbour
    from yalla_tpu.ops.lattice_xla import lattice_heun_steps
    from yalla_tpu.polarity import polarity_precompute3

    n_cells = 500_000
    X, old_v, p, force, n, pallas = _prepare_branching(n_cells)
    gs, C, e_b = (64, 64, 64), 8, 32

    # base first (the committed default), then contenders
    for zb, yb in ((2, 16), (2, 8), (2, 32), (4, 16), (4, 8), (8, 16)):
        lattice_pallas.DEFAULT_Y_BLOCK = yb

        def run():
            return lattice_heun_steps(
                n_steps, 1, force, friction_w_neighbour, "com", gs, C, zb,
                X, old_v, n, jnp.float32(p.dt), jnp.float32(p.r_max),
                jnp.int32(0), polarity_precompute3, pallas, None, None,
                jnp.float32(p.r_max), E_CAP, e_b, 0, False, 0.0, 1)

        try:
            out = run()
            _ = float(np.asarray(out[0].x)[0])
        except Exception as e:
            print(f"zb={zb} yb={yb}: failed {type(e).__name__}: {e}"[:200],
                  flush=True)
            continue
        aux = out[2]
        fired = {k: float(np.max(np.asarray(v))) for k, v in aux.items()
                 if k.startswith("__err") and float(np.max(np.asarray(v)))}
        if fired:
            print(f"zb={zb} yb={yb}: probe flagged {fired}", flush=True)
            continue
        t0 = time.perf_counter()
        out = run()
        _ = float(np.asarray(out[0].x)[0])
        dt = time.perf_counter() - t0
        print(f"zb={zb} yb={yb}: {dt / n_steps * 1e3:7.1f} ms/step "
              f"({n_cells * n_steps / dt:.4g} cell-steps/s), flags clean",
              flush=True)
    lattice_pallas.DEFAULT_Y_BLOCK = 16


if __name__ == "__main__":
    main()
