#!/usr/bin/env python
"""Measure whether TOPK=16 (per-diagonal) and EXTRACT_TOPK=64 (per-row)
truncate anything on real families — the data behind the engine
defaults (core/config.py EngineConfig).

For each family: build the full dense cutoff-thresholded posteriors
(the reference's exact sparsity regime, SparseMatrix.h:14) and record
the distribution of surviving entries per anti-diagonal and per row.
If the p100 per-diagonal count <= TOPK and p100 per-row count <=
EXTRACT_TOPK, the truncations are exactly lossless for that family.
Then align with TOPK=16 vs TOPK=64 and compare outputs.

Usage: python tools/topk_experiment.py [family ...]
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np


def occupancy(fam_path: str) -> dict:
    import jax.numpy as jnp

    from mlprobs_tpu.align import pairwise as pw
    from mlprobs_tpu.core.alphabet import degap, encode
    from mlprobs_tpu.core.fasta import read_fasta

    seqs = [degap(encode(s)) for _, s in read_fasta(fam_path)]
    n = len(seqs)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    tabs_f, tabs_r = pw._wf_tables("mix", None)
    fn = pw._wf_dense_fn(pw._MODE_MODELS["mix"])
    diag_max = row_max = 0
    diag_hist = np.zeros(64, np.int64)
    row_hist = np.zeros(256, np.int64)
    for chunk, X, Y, LX, LY in pw.iter_pair_batches(
        seqs, pairs, batch_fn=pw._wf_batch_size
    ):
        dense, _ = fn(
            jnp.asarray(X), jnp.asarray(Y), jnp.asarray(LX),
            jnp.asarray(LY), tabs_f, tabs_r,
        )
        dense = np.asarray(dense)
        for k, (i, j) in enumerate(chunk):
            li, lj = len(seqs[i]), len(seqs[j])
            d = dense[k, :li, :lj] >= 0.01
            rows = d.sum(axis=1)
            row_max = max(row_max, int(rows.max(initial=0)))
            row_hist[np.minimum(rows, 255)] += 1
            # anti-diagonal occupancy (the TOPK=16 axis)
            idx = np.arange(li)[:, None] + np.arange(lj)[None, :]
            diag = np.bincount(idx[d], minlength=li + lj)
            diag_max = max(diag_max, int(diag.max(initial=0)))
            diag_hist += np.bincount(
                np.minimum(diag, 63), minlength=64
            )
    return {
        "num_seqs": n,
        "max_len": max(len(s) for s in seqs),
        "max_entries_per_diagonal": diag_max,
        "max_entries_per_row": row_max,
        "diag_p999": _pctl(diag_hist, 0.999),
        "row_p999": _pctl(row_hist, 0.999),
    }


def _pctl(hist: np.ndarray, q: float) -> int:
    c = np.cumsum(hist)
    if c[-1] == 0:
        return 0
    return int(np.searchsorted(c, q * c[-1]))


def align_with_topk(fam_path: str, topk: int):
    from mlprobs_tpu.align import pairwise as pw
    from mlprobs_tpu.align.aligner import align_family
    from mlprobs_tpu.core.fasta import read_fasta

    old = pw.TOPK
    pw.TOPK = topk
    pw._topk_post_fn.cache_clear()
    pw._wf_fn.cache_clear()
    try:
        return align_family(read_fasta(fam_path), config="pnp")
    finally:
        pw.TOPK = old
        pw._topk_post_fn.cache_clear()
        pw._wf_fn.cache_clear()


def main() -> int:
    fams = sys.argv[1:] or [
        "/root/reference/TEST/sabre/in/sup_387",
        "/root/reference/TEST/bali3/in/BB20036",
        "/root/reference/TEST/oxx/in/_12s70",
    ]
    out = {}
    for fam in fams:
        name = Path(fam).name
        rec = occupancy(fam)
        a16 = align_with_topk(fam, 16)
        a64 = align_with_topk(fam, 64)
        rec["alignment_identical_topk16_vs_64"] = (
            a16.to_records() == a64.to_records()
        )
        if not rec["alignment_identical_topk16_vs_64"]:
            from mlprobs_tpu.bench.quality import sp_tc

            sp, tc = sp_tc(a16, a64)
            rec["sp_topk16_vs_64"] = round(sp, 4)
        out[name] = rec
        print(name, json.dumps(rec), flush=True)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
