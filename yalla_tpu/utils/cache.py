"""Persistent XLA compilation cache.

TPU compiles through the device tunnel cost minutes for the big lattice
kernels; a persistent cache makes every repeated (shape, engine) compile --
across tier jumps, engine resizes, and reruns -- near-free.  The reference
has no analogue (nvcc AOT-compiles each model once, README.md:10); this is
the JIT-world equivalent.
"""
import os

import jax

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(path=None, min_compile_secs=1.0):
    """Route XLA compilations through a persistent on-disk cache.

    ``path`` defaults to ``$JAX_COMPILATION_CACHE_DIR`` or
    ``~/.cache/yalla_tpu/xla``.  Safe to call more than once.
    """
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.cache/yalla_tpu/xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
