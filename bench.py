#!/usr/bin/env python
"""Benchmark: posterior-DP throughput of the flagship compute path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the production posterior stage (mix mode: 5-state HMM +
partition function + local HMM, forward+reverse wavefront scans, RMS
combine, MWT accuracy DP with match counts, per-diagonal top-k
sparsification) on the real chip — the inner loop that dominates
MLProbs runtime.  One "cell update" = one (i, j) DP cell of the
combined posterior plane (L^2 per pair), the same unit the reference's
OpenMP/OpenCL loops fill (SURVEY §6).

vs_baseline compares against the reference's MEASURED posterior fill
rate on this host: the prebuilt quickprobs binary timed on
posterior-dominated synthetic families (tools/measure_baseline.py
posterior_fill; results in BASELINE_CPU.json).  Measured 2026-08-19:
1.21e7 cells/s (2-core host, both cores).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_CELLS_PER_SEC = 1.21e7  # measured (BASELINE_CPU.json)


def _measured_baseline() -> float:
    """Prefer the measured rate from BASELINE_CPU.json when present."""
    try:
        path = os.path.join(os.path.dirname(__file__), "BASELINE_CPU.json")
        with open(path) as f:
            return float(json.load(f)["posterior_fill"]["cells_per_sec"])
    except Exception:
        return REFERENCE_CELLS_PER_SEC


def main() -> None:
    import jax
    import jax.numpy as jnp

    import mlprobs_tpu  # noqa: F401  (enables the compile cache)
    from mlprobs_tpu.align import pairwise

    b, lp = 512, 512
    models = pairwise._MODE_MODELS["mix"]
    fn = pairwise._wf_fn(models, True)
    tabs_f, tabs_r = pairwise._wf_tables("mix", 0.170705)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.integers(0, 20, (b, lp)), jnp.int8)
    Y = jnp.asarray(rng.integers(0, 20, (b, lp)), jnp.int8)
    LX = jnp.full((b,), lp, jnp.int32)
    LY = jnp.full((b,), lp, jnp.int32)

    def run():
        out = fn(X, Y, LX, LY, tabs_f, tabs_r)
        jax.block_until_ready(out)
        # force completion through the async RPC transport
        return np.asarray(out[2])[:2]

    run()  # warm up / compile
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters

    cells = b * lp * lp
    rate = cells / dt
    print(
        json.dumps(
            {
                "metric": "posterior_dp_cell_updates_per_sec",
                "value": rate,
                "unit": "cells/s",
                "vs_baseline": rate / _measured_baseline(),
            }
        )
    )


if __name__ == "__main__":
    main()
