"""Persistent XLA compilation cache.

The deployment environment compiles TPU executables through a remote-compile service,
which makes first compiles minutes-slow. Enabling JAX's persistent compilation cache
makes every repeat run (benchmarks, the driver's compile checks, app restarts) reuse
the compiled binaries from disk.
"""

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable(cache_dir: str = None) -> None:
    import jax

    # YASPH_CACHE_DIR overrides the default location; tools/sweep_occupancy.py
    # points it at a throwaway dir per configuration to measure COLD compile walls.
    cache_dir = cache_dir or os.environ.get("YASPH_CACHE_DIR") or os.path.abspath(
        _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # cache regardless of backend (the axon platform is nonstandard)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
