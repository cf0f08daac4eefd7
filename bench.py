#!/usr/bin/env python
"""Benchmark: posterior-DP throughput of the flagship compute path.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures mixed-model posterior cell-updates/sec on the real chip — the
inner loop that dominates MLProbs runtime.  One "cell update" = one
(i, j) DP cell filled across the three posterior models (forward +
backward each) plus the MWT pass; we count it as the number of posterior
plane cells computed per pair (L^2) times pairs/sec, the same unit the
reference's OpenMP/OpenCL loops are measured in (SURVEY §6).

vs_baseline compares against the reference CPU pipeline's effective
posterior fill rate, ~2.0e8 cells/s on a modern multicore CPU
(QuickProbs-class aligners; BASELINE.md — to be re-measured precisely).
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_CELLS_PER_SEC = 2.0e8  # CPU baseline estimate (BASELINE.md)


def main() -> None:
    import jax
    import jax.numpy as jnp

    import mlprobs_tpu  # noqa: F401  (enables the compile cache)
    from mlprobs_tpu.align import pairwise

    b, lp = 64, 512
    fn = pairwise._posterior_fn("mix")
    p5 = pairwise.hmm5_dict()
    pl = pairwise.local_dict(0.170705)
    pp = pairwise.partition_dict()
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.integers(0, 20, (b, lp)), jnp.int8)
    Y = jnp.asarray(rng.integers(0, 20, (b, lp)), jnp.int8)
    LX = jnp.full((b,), lp, jnp.int32)
    LY = jnp.full((b,), lp, jnp.int32)

    # warm up / compile
    out = fn(X, Y, LX, LY, p5, pl, pp)
    jax.block_until_ready(out)

    iters = 5
    t0 = time.time()
    for _ in range(iters):
        out = fn(X, Y, LX, LY, p5, pl, pp)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / iters

    cells = b * lp * lp
    rate = cells / dt
    print(
        json.dumps(
            {
                "metric": "posterior_dp_cell_updates_per_sec",
                "value": rate,
                "unit": "cells/s",
                "vs_baseline": rate / REFERENCE_CELLS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
