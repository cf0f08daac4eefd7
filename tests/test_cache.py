"""XLA compilation-cache keying (utils/jaxcache).

Cross-host safety: CPU AOT executables embed model-derived LLVM
pseudo-features, so two backends that differ in *any* fingerprint input
(platform, jaxlib version, CPU model, ISA flags, PJRT platform_version)
must map to different cache directories.
"""
import types

from mlprobs_tpu.utils import jaxcache


def _fake_backend(platform, version=""):
    return types.SimpleNamespace(
        platform=platform, platform_version=version
    )


def test_distinct_platform_versions_get_distinct_dirs():
    a = jaxcache.backend_tag(_fake_backend("tpu", "PJRT C API v1"))
    b = jaxcache.backend_tag(_fake_backend("tpu", "PJRT C API v2"))
    assert a != b
    assert a.startswith("tpu-") and b.startswith("tpu-")


def test_cpu_fingerprint_drives_key(monkeypatch):
    calls = iter(["Model-A|flags", "Model-B|flags"])
    monkeypatch.setattr(
        jaxcache, "_cpu_fingerprint", lambda: next(calls)
    )
    a = jaxcache.backend_tag(_fake_backend("cpu"))
    b = jaxcache.backend_tag(_fake_backend("cpu"))
    assert a != b


def test_cpu_key_ignores_env_platform(monkeypatch):
    """The tag comes from the resolved backend object, never from
    JAX_PLATFORMS (the old bug: resolved-backend runs went unkeyed)."""
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    tag = jaxcache.backend_tag(_fake_backend("cpu"))
    assert tag.startswith("cpu-")


def test_live_backend_tag_is_stable():
    from jax._src import xla_bridge

    b = xla_bridge.get_backend()
    assert jaxcache.backend_tag(b) == jaxcache.backend_tag(b)


def test_cpu_fingerprint_includes_cpuid_identity():
    """Virtualised hosts report a generic marketing name across
    different microarchitectures; LLVM keys its tuning pseudo-features
    (+prefer-no-gather, ...) on CPUID family/model/stepping.  The
    fingerprint must carry the numeric identity, not just the name."""
    fp = jaxcache._cpu_fingerprint()
    try:
        fields = {}
        with open("/proc/cpuinfo") as f:
            for line in f:
                k = line.split(":", 1)[0].strip()
                if k in ("cpu family", "model", "stepping") \
                        and k not in fields:
                    fields[k] = line.split(":", 1)[1].strip()
    except OSError:
        return  # non-Linux host: nothing to assert
    for k, v in fields.items():
        assert v in fp.split("|"), f"{k}={v} missing from fingerprint"
