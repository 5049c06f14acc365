"""Benchmark: cell-steps/sec at 500k cells (branching-class physics).

Headline metric from BASELINE.md: Heun steps of the flagship
branching-class physics (type-dependent ReLU mechanics + Turing
reaction/diffusion + epithelial bending + neighbour counters) at 500,000
cells on one TPU chip, using the dense cube-lattice engine
(ops/lattice_xla.py) with the Cartesian polarity fast path.

``REBUILD_EVERY = 4``: the spatial binning is refreshed every 4 steps with
state lattice-resident in between.  The reference rebuilds per pass, but
all its potentials vanish at the cutoff, so the brief staleness has
negligible force error (tests/test_fastpath.py quantifies it); set 1 for
reference-exact rebuild cadence.

The CUDA reference publishes no numbers (BASELINE.md); ``vs_baseline`` is
reported against an assumed 1e8 cell-steps/s for the reference's
single-GPU grid solver at this size -- the BASELINE.json target of
>= 10x CUDA corresponds to vs_baseline >= 10.

Usage: python bench.py [n_cells] [n_steps]
Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CUDA_BASELINE_CELL_STEPS_PER_SEC = 1e8  # assumed; see module docstring
REBUILD_EVERY = 4


def build(n_cells, seed=0):
    from yalla_tpu.models import branching as B
    from yalla_tpu.dtypes import Float3
    from yalla_tpu.ops.common import friction_w_neighbour
    from yalla_tpu.ops.lattice_xla import lattice_heun_steps, lattice_build
    from yalla_tpu.polarity import polarity_precompute

    rng = np.random.default_rng(seed)
    n_pad = -(-n_cells // 4096) * 4096 if n_cells > 4096 else \
        max(64, -(-n_cells // 64) * 64)

    # Jittered lattice at relaxed-tissue spacing 0.75 (bounded occupancy),
    # epithelial shell on the boundary
    side = int(np.ceil(n_cells ** (1 / 3)))
    g = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                 -1).reshape(-1, 3)[:n_pad]
    pos = (g - side / 2) * 0.75 + rng.uniform(-0.2, 0.2, (len(g), 3))
    pos = np.concatenate(
        [pos, np.zeros((max(0, n_pad - len(pos)), 3))])[:n_pad]
    surface = np.abs(pos).max(1) > (side / 2 * 0.75 - 1.0)
    rr = np.maximum(np.linalg.norm(pos, axis=1), 1e-6)

    X = B.Cell(
        x=jnp.asarray(pos[:, 0], jnp.float32),
        y=jnp.asarray(pos[:, 1], jnp.float32),
        z=jnp.asarray(pos[:, 2], jnp.float32),
        theta=jnp.asarray(np.where(surface, np.arccos(
            np.clip(pos[:, 2] / rr, -1, 1)), 0), jnp.float32),
        phi=jnp.asarray(np.where(surface, np.arctan2(pos[:, 1], pos[:, 0]),
                                 0), jnp.float32),
        u=jnp.asarray(rng.random(n_pad) * 0.1, jnp.float32),
        v=jnp.asarray(rng.random(n_pad) * 0.1, jnp.float32),
        ctype=jnp.asarray(surface.astype(np.float32)),
    )
    old_v = Float3.zeros(n_pad)

    p = B.Params()
    force = B.make_force(p)

    # Pallas lattice kernel sized to the populated box: the round-2 fast
    # path beats all-pairs from well below the reference's ~7k crossover
    # (solvers.cuh:346-347); measured r2: 1.3 ms/step @ 5k (gs=16),
    # ~60 ms/step @ 500k (gs=64), both C=8, zb=2, rebuild_every=4.
    extent = side * 0.75 / 2 + 0.25
    gs = 16
    while gs * p.r_max < 2.0 * (extent + 1.0):
        gs *= 2
    C, zb = 8, 2
    pallas = jax.default_backend() == "tpu"

    lay = lattice_build(X, old_v, jnp.int32(n_cells), jnp.float32(p.r_max),
                        gs, C)
    dropped = int(lay.n_dropped)
    assert dropped == 0, f"lattice capacity overflow: {dropped} dropped"

    def run(n_steps):
        k = REBUILD_EVERY
        while n_steps % k:
            k -= 1
        return lattice_heun_steps(
            n_steps, k, force, friction_w_neighbour, "com", gs, C, zb,
            X, old_v, jnp.int32(n_cells), jnp.float32(p.dt),
            jnp.float32(p.r_max), jnp.int32(0), polarity_precompute,
            pallas)

    return run


def main():
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    run = build(n_cells)
    out = run(n_steps)  # compile + warm up (same scan length as timed run)
    _ = float(np.asarray(out[0].x)[0])  # force completion (readback)

    t0 = time.perf_counter()
    out = run(n_steps)
    _ = float(np.asarray(out[0].x)[0])
    dt = time.perf_counter() - t0

    cell_steps_per_sec = n_cells * n_steps / dt
    print(json.dumps({
        "metric": f"cell_steps_per_sec_branching_{n_cells // 1000}k",
        "value": round(cell_steps_per_sec, 1),
        "unit": "cell-steps/s",
        "vs_baseline": round(
            cell_steps_per_sec / CUDA_BASELINE_CELL_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
