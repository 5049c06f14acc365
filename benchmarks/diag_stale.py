"""Diagnose the 500k staleness/rebuild trade (round-3 perf work).

Measures, per rebuild cadence: step rate, the shear-closure metric the
certificate compares against the binning margin, and the absolute
max-displacement fallback -- plus the standalone cost of lattice_build
(the rebuild itself) at 500k.  Decides how the bench should pick
(cube_size, rebuild_every).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # noqa: E402

n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

run = bench.build(n_cells)
print("config:", run.config, flush=True)

for rebuild, cm in ((4, 1.0), (2, 1.0), (1, 1.0)):
    out = run(steps, rebuild, cm)
    _ = float(np.asarray(out[0].x)[0])
    t0 = time.perf_counter()
    out = run(steps, rebuild, cm)
    _ = float(np.asarray(out[0].x)[0])
    dt = time.perf_counter() - t0
    aux = out[2]
    print(f"rebuild={rebuild} cube_mult={cm}: "
          f"{n_cells * steps / dt:.3g} c-s/s ({dt / steps * 1000:.0f} ms/step) "
          f"stale={aux.get('__err_stale', 'n/a')} "
          f"closure={float(aux.get('stale_shear_closure', float('nan'))):.3f} "
          f"max_disp={float(aux.get('stale_max_disp', float('nan'))):.3f} "
          f"dropped={int(aux['__err_lattice_dropped'])} "
          f"extras_blk={float(aux.get('__err_extras_block', 0.0))}",
          flush=True)
