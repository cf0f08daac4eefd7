import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths
# are exercised without TPU hardware (and without touching the tunneled
# chip, which serializes across processes).  The environment ships with
# JAX_PLATFORMS=axon pre-set, so override rather than setdefault; export
# MLPROBS_TEST_TPU=1 to deliberately run tests on the real chip.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if not os.environ.get("MLPROBS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The axon sitecustomize hook imports jax before any user code, so
    # the env var alone is too late — override the live config too
    # (backends initialise lazily, so this still takes effect).
    import jax

    jax.config.update("jax_platforms", "cpu")
