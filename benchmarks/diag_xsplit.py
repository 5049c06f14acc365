"""Race the thin-x-cube (x_split=2) lattice kernel against the isotropic
one on the branching force at a settled state.

The pass ablation (diag_ablate500k.py) put the 500k per-step cost at
~88 ms kernel + ~29 ms rebuild at the certified per-pass cadence;
x_split=2 halves the per-cube capacity (C=8 -> ~4 with extras) and cuts
the flat shift count 4C-1 -> 6C'-1, so the kernel's offset loop shrinks
~1.35x at equal lane width.  This measures both kernels on the SAME
state so the bench's x_split rung has a known expectation.

Usage: python benchmarks/diag_xsplit.py [n_cells] [n_steps]
(default 100000 16; uses the bench's IC + relu relaxation only -- the
relative kernel cost is what matters, not the exact settled regime)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from yalla_tpu.dtypes import Float3
from yalla_tpu.models import branching as B
from yalla_tpu.ops.common import friction_w_neighbour
from yalla_tpu.ops.lattice_xla import lattice_heun_steps
from yalla_tpu.polarity import polarity_precompute


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    n_pad = -(-n_cells // 4096) * 4096
    X = bench._ic(n_cells, n_pad)
    old_v = Float3.zeros(n_pad)
    p = B.Params()
    force = B.make_force(p)
    n = jnp.int32(n_cells)
    pallas = jax.default_backend() == "tpu"

    from yalla_tpu.inits import relu_force
    from yalla_tpu.ops.lattice_xla import lattice_grid_for
    _, extent0 = bench._max_occ(X, n_cells, 64, p.r_max)
    gs0 = lattice_grid_for(extent0 * 1.04 + 1.0, p.r_max, 8)
    X, old_v, aux = lattice_heun_steps(
        48, 4, relu_force, friction_w_neighbour, "com", gs0, 8, 2,
        X, old_v, n, jnp.float32(p.dt), jnp.float32(p.r_max),
        jnp.int32(0), None, pallas)
    assert int(aux["__err_out_of_grid"]) == 0

    def run_plan(x_split, rebin):
        best = bench._plan_lattice(X, n_cells, p.r_max, (1.0, 1.1),
                                   pallas, x_split=x_split)
        if best is None:
            print(f"# x_split={x_split}: no plan", file=sys.stderr)
            return
        _, m, gs, C, occ, _, n_e, e_b = best
        cube = p.r_max * m
        extras_cap = bench.E_CAP if e_b else 0
        m_cap = -(-n_cells // 8 // 4096) * 4096 * 2 if rebin else 0

        def go():
            return lattice_heun_steps(
                n_steps, 1, force, friction_w_neighbour, "com", gs, C, 2,
                X, old_v, n, jnp.float32(p.dt), jnp.float32(cube),
                jnp.int32(0), polarity_precompute, pallas, None, None,
                jnp.float32(p.r_max), extras_cap, max(e_b, 8),
                m_cap, bool(rebin), 0.0, x_split)

        out = go()
        _ = float(np.asarray(out[0].x)[0])
        flags = {k: float(np.max(np.asarray(v)))
                 for k, v in out[2].items()
                 if k.startswith("__err") and float(np.max(np.asarray(v)))}
        t0 = time.perf_counter()
        out = go()
        _ = float(np.asarray(out[0].x)[0])
        dt_s = time.perf_counter() - t0
        print(f"x_split={x_split} rebin={rebin}: gs={gs} C={C} occ={occ} "
              f"cube={cube:.2f} extras={n_e}/blk{e_b} -> "
              f"{dt_s / n_steps * 1e3:.1f} ms/step "
              f"({n_cells * n_steps / dt_s:.3g} cell-steps/s) "
              f"flags={flags or 'clean'}", flush=True)

    for rebin in (False, True):
        for xs in (1, 2):
            run_plan(xs, rebin)


if __name__ == "__main__":
    main()
