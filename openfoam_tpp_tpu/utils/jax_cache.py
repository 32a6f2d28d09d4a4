"""Persistent XLA compilation cache for the product paths.

The solver programs take minutes to compile (the axon-tunneled TPU
compiler in this environment is remote); without a persistent cache
every CLI invocation — including a resume that then does zero steps —
pays the full compile. Tests enable this via conftest; this helper does
the same for the manager/bench/entry paths. Cache location:
``OFTPP_JAX_CACHE`` env var, else ``~/.cache/openfoam_tpp_tpu/jax``.

Call before the first jit compilation. No-op if the user already
configured a cache via JAX_COMPILATION_CACHE_DIR or jax.config.
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> str | None:
    """Enable the on-disk compile cache; returns its path (None = left
    to a pre-existing user configuration)."""
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return None
    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:   # very old jax — nothing to do
        return None
    if current:
        return None
    path = os.environ.get("OFTPP_JAX_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "openfoam_tpp_tpu", "jax")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
