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

def _ensure_cpnp_binary():
    """Build the reference c_p_np_aln into /tmp so parity tests always run.

    The strongest tests in the suite compare against the reference binary
    (baseMSA/C_P_NP_Aln); it builds in ~30 s from the reference Makefile.
    Kept out of pytest fixtures so the skip-guard in test_parity.py sees
    the binary at collection time.
    """
    import shutil
    import subprocess
    from pathlib import Path

    src = Path("/root/reference/baseMSA/C_P_NP_Aln")
    dst = Path("/tmp/cpnp_build")
    binary = dst / "c_p_np_aln"
    if binary.exists() or not (src / "Makefile").exists():
        return
    dst.mkdir(parents=True, exist_ok=True)
    for f in src.iterdir():
        if f.suffix in (".cpp", ".h") or f.name == "Makefile":
            shutil.copy2(f, dst / f.name)
    subprocess.run(
        ["make", "-j", str(os.cpu_count() or 2)],
        cwd=dst, capture_output=True, timeout=600, check=False,
    )


_ensure_cpnp_binary()

if not os.environ.get("MLPROBS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The axon sitecustomize hook imports jax before any user code, so
    # the env var alone is too late — override the live config too
    # (backends initialise lazily, so this still takes effect).
    import jax

    jax.config.update("jax_platforms", "cpu")
