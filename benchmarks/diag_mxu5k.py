"""Time the 5k-class all-pairs racers (round-4 MXU kernel rewrite).

The round-3 ``central_pairwise_mxu`` computed the pair matrix in
``(BI, n_pad)`` orientation: its force/friction reductions were
``(128, n_pad) @ (n_pad, 8)`` matmuls whose N = 8 pads to the 128-lane
MXU tile (16x cycle waste), at HIGHEST precision (6 bf16 passes) --
~2 ms/step at 5120 padded cells, i.e. the MXU was the bottleneck of a
kernel built to off-load the VPU.  The round-4 kernel transposes the
orientation so reductions are ``(8, n_pad) @ (n_pad, 128)`` (M = 8
streams in 8 rows) and moves distances/bilinear channels to exact-f32
VPU broadcasts.  This script times full Heun steps for the MXU, tile
and lattice contenders at the BASELINE 5k config.
"""
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 320

for name, builder in (("mxu", bench.build_sorting_mxu),
                      ("tile", bench.build_sorting_tile)):
    run = builder(n_cells)
    out = run(steps)
    _ = float(np.asarray(out[0].x)[0])        # tunnel sync
    t0 = time.perf_counter()
    out = run(steps)
    _ = float(np.asarray(out[0].x)[0])
    dt = time.perf_counter() - t0
    aux = out[2]
    flags = {k: float(v) for k, v in aux.items()
             if k.startswith("__err_") and float(v)}
    print(f"{name}: {n_cells * steps / dt:.4g} c-s/s "
          f"({dt / steps * 1000:.3f} ms/step) flags={flags}", flush=True)
