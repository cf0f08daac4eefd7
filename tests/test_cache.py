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
