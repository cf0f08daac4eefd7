"""QuickProbs-style column refinement.

Reference: ColumnRefinement.cpp + RefinementBase.cpp.  Each pass picks a
random alignment column, splits sequences by gap/residue at that column,
realigns the two groups with the weighted profile posterior (with the
posteriorCutoff subtraction) and accepts the candidate only if it does
not lengthen the alignment (acceptanceLength, Configuration.cpp:130).
"""
from __future__ import annotations

import numpy as np

from mlprobs_tpu.align.progressive import build_profile_posterior, mwt_path
from mlprobs_tpu.core.msa import MSA, merge_alignments
from mlprobs_tpu.utils.crand import GlibcRand

CUTOFF = 0.01


def column_refinement(
    alignment: MSA,
    posts: dict,
    weights: np.ndarray,
    rng: GlibcRand,
    iterations: int,
    cutoff: float = CUTOFF,
) -> MSA:
    n = alignment.num_seqs
    if n < 2:
        return alignment
    for _ in range(iterations):
        length = alignment.length
        if length == 0:
            break
        col = rng.rand() % length
        gap_rows = [
            i for i in range(n) if alignment.rows[i, col] < 0
        ]
        res_rows = [i for i in range(n) if alignment.rows[i, col] >= 0]
        if not gap_rows or not res_rows:
            continue
        g1 = alignment.project(gap_rows)
        g2 = alignment.project(res_rows)
        prof = build_profile_posterior(
            g1, g2, posts, weights, cutoff_sub=cutoff
        )
        path, _ = mwt_path(prof)
        candidate = merge_alignments(g1, g2, path).sort_by_label()
        if candidate.length <= alignment.length:
            alignment = candidate
    return alignment
