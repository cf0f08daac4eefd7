"""Progressive profile-profile alignment and iterative refinement.

Reference: MSA::ProcessTree/AlignAlignments (MSA.cpp:1369-1471),
ProbabilisticModel::BuildPosterior weighted/unweighted
(ProbabilisticModel.h:1197-1379), ComputeFinalAlignment +
DoIterativeRefinement (MSA.cpp:1481-1623).

The profile posterior is a weighted scatter of every inter-group sparse
pair posterior through the gap mappings; the merge itself is the MWT DP
(device) + host traceback.
"""
from __future__ import annotations

import functools

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from mlprobs_tpu.align import traceback as tbk
from mlprobs_tpu.align.tree import TreeNode, clustalw_weights
from mlprobs_tpu.core.msa import MSA, merge_alignments
from mlprobs_tpu.ops import mwt
from mlprobs_tpu.utils.crand import GlibcRand


@functools.lru_cache(maxsize=64)
def _mwt_fn():
    return jax.jit(mwt.mwt_align, static_argnames=())


def _pad_plane(r: np.ndarray, mult: int = 64) -> np.ndarray:
    lx, ly = r.shape
    px = -(-max(lx, 1) // mult) * mult
    py = -(-max(ly, 1) // mult) * mult
    out = np.zeros((px, py), dtype=np.float32)
    out[:lx, :ly] = r
    return out


# Planes below this area run the DP on the host: the device round-trip
# latency (~100 ms over a tunneled chip) dwarfs the compute.  The
# vectorised host fill runs at ~50M cells/s, so even 2048^2 planes are
# faster locally than one tunneled round trip.
from mlprobs_tpu.core.config import DEFAULT as _CFG

HOST_MWT_AREA = _CFG.engine.host_mwt_area


def _mwt_host(post: np.ndarray) -> tuple[np.ndarray, float]:
    """Vectorised host MWT fill (same recurrence/tie-breaks as ops.mwt)."""
    lx, ly = post.shape
    post = post.astype(np.float32)
    dirs = np.empty((lx + 1, ly + 1), dtype=np.int8)
    dirs[0, :] = 1
    s_prev = np.zeros(ly + 1, dtype=np.float32)
    row = np.empty(ly + 1, dtype=np.float32)
    for i in range(1, lx + 1):
        pd = np.empty(ly + 1, dtype=np.float32)
        pd[0] = 0.0
        pd[1:] = post[i - 1] + s_prev[:-1]
        a = np.maximum(pd, s_prev)
        s = np.maximum.accumulate(a)
        s[0] = 0.0
        left = np.empty_like(s)
        left[0] = 0.0
        left[1:] = s[:-1]
        d = np.where((pd >= left) & (pd >= s_prev), 0,
                     np.where(left >= s_prev, 1, 2)).astype(np.int8)
        d[0] = 2
        dirs[i] = d
        s_prev = s
    return dirs, float(s_prev[ly])


def mwt_path(post: np.ndarray) -> tuple[np.ndarray, float]:
    """Run the MWT DP on a dense posterior plane; return (path, score)."""
    lx, ly = post.shape
    if lx * ly <= HOST_MWT_AREA:
        dirs, score = _mwt_host(np.asarray(post))
        return tbk.mwt_traceback(dirs, lx, ly), score
    padded = _pad_plane(post)
    dirs, score = _mwt_fn()(jnp.asarray(padded), lx, ly)
    path = tbk.mwt_traceback(np.asarray(dirs), lx, ly)
    return path, float(score)


def build_profile_posterior(
    group1: MSA,
    group2: MSA,
    posts: dict[tuple[int, int], sp.csr_matrix],
    weights: np.ndarray | None = None,
    cutoff_sub: float = 0.0,
) -> np.ndarray:
    """Dense (L1, L2) profile posterior by scatter through gap mappings.

    `weights` are ClustalW weights indexed by original label; if None the
    unweighted builder is used (refinement path).  `cutoff_sub` is the
    QuickProbs posteriorCutoff subtraction (w * cutoff removed at every
    mapped cell, ProbabilisticModel.h:1253-1257); the base aligner runs
    with cutoff 0 (MSA.cpp:38).
    """
    l1, l2 = group1.length, group2.length
    maps1 = [np.flatnonzero(group1.rows[a] >= 0) for a in range(group1.num_seqs)]
    maps2 = [np.flatnonzero(group2.rows[b] >= 0) for b in range(group2.num_seqs)]
    if weights is not None:
        total_w = sum(
            float(weights[la]) * float(weights[lb])
            for la in group1.labels
            for lb in group2.labels
        )
        if total_w == 0:
            total_w = 1
    sub = None
    flat_idx: list[np.ndarray] = []
    flat_val: list[np.ndarray] = []
    for a in range(group1.num_seqs):
        la = int(group1.labels[a])
        for b in range(group2.num_seqs):
            lb = int(group2.labels[b])
            w = 1.0
            if weights is not None:
                w = float(weights[la]) * float(weights[lb]) / total_w
            key = (la, lb) if la < lb else (lb, la)
            s = posts[key]
            coo = s.__dict__.get("_coo_cache")
            if coo is None:
                c = s.tocoo()
                coo = (c.row, c.col, c.data)
                s._coo_cache = coo
            srow, scol, sdata = coo
            if la < lb:
                rows, cols = srow, scol
            else:
                rows, cols = scol, srow
            flat_idx.append(
                maps1[a][rows].astype(np.int64) * l2 + maps2[b][cols]
            )
            flat_val.append(w * sdata)
            if cutoff_sub:
                # reference subtracts over ungapped rows x the first
                # l2-1 ungapped columns (the mapping's 0 sentinel swallows
                # one entry, ProbabilisticModel.h:1254)
                if sub is None:
                    sub = np.zeros((l1, l2), dtype=np.float64)
                sub[np.ix_(maps1[a], maps2[b][:-1])] -= w * cutoff_sub
    out = np.bincount(
        np.concatenate(flat_idx) if flat_idx else np.zeros(0, np.int64),
        weights=np.concatenate(flat_val) if flat_val else None,
        minlength=l1 * l2,
    ).reshape(l1, l2)
    if sub is not None:
        out = out + sub
    return out.astype(np.float32)


def align_profiles(
    group1: MSA,
    group2: MSA,
    posts: dict[tuple[int, int], sp.csr_matrix],
    weights: np.ndarray | None,
    cutoff_sub: float = 0.0,
) -> tuple[MSA, float]:
    """AlignAlignments: profile posterior -> MWT -> merge -> sort."""
    prof = build_profile_posterior(group1, group2, posts, weights,
                                   cutoff_sub=cutoff_sub)
    path, score = mwt_path(prof)
    merged = merge_alignments(group1, group2, path)
    return merged.sort_by_label(), score


def process_tree(
    node: TreeNode,
    seqs_msa: MSA,
    posts: dict[tuple[int, int], sp.csr_matrix],
    weights: np.ndarray,
    cutoff_sub: float = 0.0,
) -> MSA:
    if node.leaf:
        return seqs_msa.project([node.idx])
    left = process_tree(node.left, seqs_msa, posts, weights, cutoff_sub)
    right = process_tree(node.right, seqs_msa, posts, weights, cutoff_sub)
    merged, _ = align_profiles(left, right, posts, weights, cutoff_sub)
    return merged


def iterative_refinement_pass(
    alignment: MSA,
    posts: dict[tuple[int, int], sp.csr_matrix],
    rng: GlibcRand,
) -> tuple[MSA, int]:
    """One DoIterativeRefinement pass.  Returns (alignment, flag).

    flag: 2 = degenerate split, 1 = score unchanged, 0 = changed.
    The realigned MSA always replaces the input (reference semantics).
    """
    n = alignment.num_seqs
    group1_idx = [i for i in range(n) if rng.rand() % 2]
    group2_idx = [i for i in range(n) if i not in set(group1_idx)]
    if not group1_idx or not group2_idx:
        return alignment, 2
    g1 = alignment.project(group1_idx)
    g2 = alignment.project(group2_idx)
    prof = build_profile_posterior(g1, g2, posts, weights=None)

    # accuracy of the current alignment under the profile posterior
    in1 = (alignment.rows[group1_idx] >= 0).any(axis=0)
    in2 = (alignment.rows[group2_idx] >= 0).any(axis=0)
    pos1 = np.cumsum(in1) - 1
    pos2 = np.cumsum(in2) - 1
    both = in1 & in2
    accuracy_before = float(prof[pos1[both], pos2[both]].sum()) if both.any() else 0.0

    path, score = mwt_path(prof)
    merged = merge_alignments(g1, g2, path)
    flag = 1 if accuracy_before == score else 0
    return merged, flag


def compute_final_alignment(
    root: TreeNode,
    seqs_msa: MSA,
    posts: dict[tuple[int, int], sp.csr_matrix],
    pid: int,
    rng: GlibcRand,
    base_reps: int = 100,
) -> MSA:
    """ProcessTree + the adaptive refinement loop (MSA.cpp:1481-1534)."""
    n = seqs_msa.num_seqs
    weights = clustalw_weights(root, n)
    alignment = process_tree(root, seqs_msa, posts, weights)

    reps = base_reps
    if pid > 3 or n > 150:
        reps = 0
    if n <= 50:
        reps = 2 * reps
    ineffectiveness = 0
    i = 0
    iter_cutoff = 100
    while i < reps:
        alignment, flag = iterative_refinement_pass(alignment, posts, rng)
        if n > 20:
            if n < 200:
                if flag > 0:
                    if reps < 4 * n:
                        reps += 1
                    if flag == 1:
                        ineffectiveness += 1
                if ineffectiveness > 2 * n and i > iter_cutoff:
                    break
            elif n > 200:
                reps = 10
        i += 1
    return alignment
