"""Persistent XLA compilation cache.

The pipeline runs one process per family in benchmark mode (like the
reference's script.py); without a persistent cache every process repays
20-60 s of XLA compiles.  Importing mlprobs_tpu enables the on-disk
cache so compiles amortise across processes.
"""
from __future__ import annotations

import os
from pathlib import Path


def enable() -> None:
    import jax

    cache_dir = os.environ.get(
        "MLPROBS_JAX_CACHE",
        str(Path.home() / ".cache" / "mlprobs_jax"),
    )
    # separate per platform: CPU AOT executables are machine-profiled
    # and the tunneled-TPU server may compile with different features
    platform = os.environ.get("JAX_PLATFORMS", "default").split(",")[0]
    cache_dir = str(Path(cache_dir) / (platform or "default"))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
