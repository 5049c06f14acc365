"""Why do the 500k rebin probes flag?  Runs the rebin rungs directly on
the bench's relaxed state and prints every fired flag + the closure.
Usage: python benchmarks/diag_rebin.py [n] [steps]
"""
import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

run0 = bench.build(n_cells)
for cube_m, rebuild, rebin in ((1.192, 1, True), (1.0, 1, True),
                               (1.192, 4, False)):
    run = run0 if cube_m == 1.0 else run0.remake((cube_m,))
    if run is None:
        print(f"no plan at cube x{cube_m}")
        continue
    out = run(n_steps, rebuild, 1.0, rebin=rebin)
    _ = float(np.asarray(out[0].x)[0])
    aux = out[2]
    fired = {k: float(np.max(np.asarray(v))) for k, v in aux.items()
             if k.startswith("__err")
             and float(np.max(np.asarray(v))) != 0.0}
    print(f"cube x{cube_m} rebuild={rebuild} rebin={rebin}: "
          f"closure={float(aux.get('stale_shear_closure', np.nan)):.3f} "
          f"disp={float(aux.get('stale_max_disp', np.nan)):.3f} "
          f"fired={fired} config={run.config}")
