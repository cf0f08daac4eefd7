"""Persistent XLA compilation cache.

The pipeline runs one process per family in benchmark mode (like the
reference's script.py); without a persistent cache every process repays
20-60 s of XLA compiles.  Importing mlprobs_tpu enables the on-disk
cache so compiles amortise across processes.

The cache directory is keyed per *resolved backend*.  XLA:CPU entries
are AOT executables compiled for an LLVM target-feature string that
includes pseudo-features (+prefer-no-scatter, +prefer-no-gather, ...)
derived from the detected CPU *model*, not just its ISA flag set — two
hosts with identical /proc/cpuinfo flags but different models can get
different feature strings, and loading the other host's blob flips
instruction selection (cpu_aot_loader.cc warns of SIGILL) and DP
tie-breaks.  The key therefore hashes jaxlib version + CPU model name +
flags; accelerator backends hash the PJRT platform_version (compiler
build / serialization version).
"""
from __future__ import annotations

import hashlib
import os
from pathlib import Path


def _cpu_fingerprint() -> str:
    """CPUID identity + ISA flags: the inputs LLVM's host detection
    uses to pick the target CPU (and with it the pseudo-feature tuning
    flags XLA bakes into AOT executables).

    The marketing "model name" alone is NOT sufficient: virtualised
    hosts report a generic string ("Intel(R) Xeon(R) Processor @
    2.10GHz") across different microarchitectures, while LLVM's
    getHostCPUName() keys on CPUID family/model/stepping — two VMs with
    identical names and flags can still get different tuning
    pseudo-features (+prefer-no-gather, ...).  Include the numeric
    CPUID identity so the cache key tracks what LLVM actually sees."""
    fields = {"model name": "", "cpu family": "", "model": "",
              "stepping": "", "vendor_id": ""}
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in fields and not fields[key]:
                    fields[key] = line.split(":", 1)[1].strip()
                elif key == "flags" and not flags:
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
    except OSError:
        pass
    ident = "|".join(fields[k] for k in sorted(fields))
    if not (ident.strip("|") or flags):
        import platform as _p

        ident = _p.processor() or _p.machine()
    return ident + "|" + flags


def backend_tag(backend) -> str:
    """Cache-dir tag for a live (initialised) JAX backend."""
    import jaxlib

    parts = [backend.platform, getattr(jaxlib, "__version__", "?")]
    # Every tag carries the host-CPU fingerprint: even an accelerator
    # process compiles XLA:CPU programs (host fallback engines), and
    # those entries land in the same cache dir — sharing it across
    # hosts with different CPUs is how wrong-machine AOT blobs travel.
    parts.append(_cpu_fingerprint())
    if backend.platform != "cpu":
        parts.append(str(getattr(backend, "platform_version", "")))
    digest = hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]
    return f"{backend.platform}-{digest}"


def enable() -> None:
    import jax

    cache_dir = os.environ.get(
        "MLPROBS_JAX_CACHE",
        str(Path.home() / ".cache" / "mlprobs_jax"),
    )
    # Resolve the actual backend (initialises it): the key must reflect
    # what will execute, not the JAX_PLATFORMS env var — the unkeyed
    # "default" fallback is exactly how cross-host AOT blobs used to
    # collide.
    try:
        from jax._src import xla_bridge

        backend = xla_bridge.get_backend()
        tag = backend_tag(backend)
    except Exception:
        backend = None
        tag = "default"
    if backend is not None and backend.platform == "cpu":
        # Do NOT persist XLA:CPU entries.  CPU executables are AOT blobs
        # whose LLVM target features come from CPUID host detection; the
        # CPUID-derived key above still collides across virtualised
        # hosts whose /proc/cpuinfo agrees but whose LLVM feature
        # baking differs (observed: blobs compiled with +amx-fp16/+avx10
        # loading on a host without them — cpu_aot_loader warns of
        # SIGILL and DP tie-breaks can flip).  In-process CPU compiles
        # are cheap; a wrong-machine executable is silent corruption.
        # Accelerator backends keep the cache (their serialized
        # artifacts are device-targeted, not host-CPUID-targeted).
        return
    cache_dir = str(Path(cache_dir) / tag)
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
