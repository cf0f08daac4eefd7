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


def entropy_score(alignment: MSA) -> float:
    """Negative column-entropy score (QuickProbs EntropyEvaluator role):
    higher = more conserved columns."""
    rows = alignment.rows
    n, length = rows.shape
    if length == 0 or n == 0:
        return 0.0
    score = 0.0
    for c in range(length):
        col = rows[:, c]
        col = col[col >= 0]
        if col.size == 0:
            continue
        _, counts = np.unique(col, return_counts=True)
        p = counts / col.size
        score -= float((p * np.log(p)).sum())
    return -score


def random_refinement(
    alignment: MSA,
    posts: dict,
    weights: np.ndarray,
    rng: GlibcRand,
    iterations: int,
    cutoff: float = CUTOFF,
) -> MSA:
    """RandomRefinement: RNG bipartition with length acceptance."""
    n = alignment.num_seqs
    for _ in range(iterations):
        g1 = [i for i in range(n) if rng.rand() % 2]
        g2 = [i for i in range(n) if i not in set(g1)]
        if not g1 or not g2:
            continue
        p1 = alignment.project(g1)
        p2 = alignment.project(g2)
        prof = build_profile_posterior(p1, p2, posts, weights,
                                       cutoff_sub=cutoff)
        path, _ = mwt_path(prof)
        candidate = merge_alignments(p1, p2, path).sort_by_label()
        if candidate.length <= alignment.length:
            alignment = candidate
    return alignment


def tree_refinement(
    alignment: MSA,
    posts: dict,
    weights: np.ndarray,
    rng: GlibcRand,
    iterations: int,
    root,
    cutoff: float = CUTOFF,
) -> MSA:
    """TreeRefinement: cut a random internal edge; realign the two sides."""
    from mlprobs_tpu.align.tree import TreeNode, leaves

    internals: list[TreeNode] = []

    def collect(t: TreeNode):
        if not t.leaf:
            if t.parent is not None:
                internals.append(t)
            collect(t.left)
            collect(t.right)

    collect(root)
    n = alignment.num_seqs
    label_to_row = {int(l): r for r, l in enumerate(alignment.labels)}
    for _ in range(iterations):
        if not internals:
            break
        node = internals[rng.rand() % len(internals)]
        g1 = sorted(label_to_row[l] for l in leaves(node))
        g2 = [i for i in range(n) if i not in set(g1)]
        if not g1 or not g2:
            continue
        p1 = alignment.project(g1)
        p2 = alignment.project(g2)
        prof = build_profile_posterior(p1, p2, posts, weights,
                                       cutoff_sub=cutoff)
        path, _ = mwt_path(prof)
        candidate = merge_alignments(p1, p2, path).sort_by_label()
        if candidate.length <= alignment.length:
            alignment = candidate
        label_to_row = {int(l): r for r, l in enumerate(alignment.labels)}
    return alignment


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
