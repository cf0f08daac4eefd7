"""Persistent XLA compilation cache.

The pipeline runs one process per family in benchmark mode (like the
reference's script.py); without a persistent cache every process repays
20-60 s of XLA compiles.  Importing mlprobs_tpu enables the on-disk
cache so compiles amortise across processes.
"""
from __future__ import annotations

import hashlib
import os
from pathlib import Path


def _machine_tag() -> str:
    """Fingerprint of the host CPU's ISA features.

    CPU AOT executables are machine-profiled; an entry compiled on a
    host with different vector extensions loads with wrong instruction
    selection (XLA warns of SIGILL) and can round differently, flipping
    DP tie-breaks run-to-run.  Keying the cache dir on the feature set
    makes cross-host entries invisible instead of latent.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    import platform as _p

    return _p.machine()


def enable() -> None:
    import jax

    cache_dir = os.environ.get(
        "MLPROBS_JAX_CACHE",
        str(Path.home() / ".cache" / "mlprobs_jax"),
    )
    # separate per platform: CPU AOT executables are machine-profiled
    # and the tunneled-TPU server may compile with different features
    platform = os.environ.get("JAX_PLATFORMS", "default").split(",")[0]
    tag = (platform or "default")
    if tag == "cpu":
        tag += "-" + _machine_tag()
    cache_dir = str(Path(cache_dir) / tag)
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
