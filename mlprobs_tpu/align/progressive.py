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
    """Run the MWT DP on a dense posterior plane; return (path, score).

    The native fill runs ~2e8 cells/s, so even the largest profile
    planes are cheaper locally than one device round trip (a tunneled
    chip costs ~0.25 s per sync); the jitted device DP remains only as
    the no-toolchain fallback for big planes."""
    from mlprobs_tpu.utils import native

    res = native.mwt_fill(np.asarray(post))
    if res is not None:
        lx, ly = post.shape
        dirs, score = res
        return tbk.mwt_traceback(dirs, lx, ly), score
    lx, ly = post.shape
    if lx * ly <= HOST_MWT_AREA:
        dirs, score = _mwt_host(np.asarray(post))
        return tbk.mwt_traceback(dirs, lx, ly), score
    padded = _pad_plane(post)
    dirs, score = _mwt_fn()(jnp.asarray(padded), lx, ly)
    path = tbk.mwt_traceback(np.asarray(dirs), lx, ly)
    return path, float(score)


class PostPool:
    """Pooled COO of all ordered pair posteriors.

    Built once per posts dict so the native profile builder
    (BuildPosterior role) can scatter every inter-group pair without
    per-pair Python/scipy work; `index[(la, lb)]` -> (start, len) into
    the shared (r, c, v) pools (both orientations stored)."""

    def __init__(self, posts: dict[tuple[int, int], sp.csr_matrix]):
        rs, cs, vs = [], [], []
        self.index: dict[tuple[int, int], tuple[int, int]] = {}
        off = 0
        for (i, j), s in posts.items():
            coo = s.tocoo()
            r = coo.row.astype(np.int32)
            c = coo.col.astype(np.int32)
            v = coo.data.astype(np.float32)
            rs += [r, c]
            cs += [c, r]
            vs += [v, v]
            self.index[(i, j)] = (off, len(v))
            off += len(v)
            self.index[(j, i)] = (off, len(v))
            off += len(v)
        z32 = np.zeros(0, np.int32)
        self.r = np.concatenate(rs) if rs else z32
        self.c = np.concatenate(cs) if cs else z32
        self.v = (np.concatenate(vs) if vs
                  else np.zeros(0, np.float32))


def _native_profile_posterior(group1, group2, pool, weights,
                              cutoff_sub):
    from mlprobs_tpu.utils import native

    if native.lib() is None:
        return None
    l1, l2 = group1.length, group2.length
    maps1 = [np.flatnonzero(group1.rows[a] >= 0).astype(np.int32)
             for a in range(group1.num_seqs)]
    maps2 = [np.flatnonzero(group2.rows[b] >= 0).astype(np.int32)
             for b in range(group2.num_seqs)]
    m1_off = np.zeros(len(maps1) + 1, np.int64)
    m1_off[1:] = np.cumsum([len(m) for m in maps1])
    m2_off = np.zeros(len(maps2) + 1, np.int64)
    m2_off[1:] = np.cumsum([len(m) for m in maps2])
    n1, n2 = group1.num_seqs, group2.num_seqs
    la = [int(x) for x in group1.labels]
    lb = [int(x) for x in group2.labels]
    if weights is not None:
        total_w = sum(
            float(weights[a]) * float(weights[b])
            for a in la for b in lb
        ) or 1.0
    starts = np.empty(n1 * n2, np.int64)
    lens = np.empty(n1 * n2, np.int64)
    a_idx = np.empty(n1 * n2, np.int32)
    b_idx = np.empty(n1 * n2, np.int32)
    wts = np.empty(n1 * n2, np.float32)
    k = 0
    for a in range(n1):
        for b in range(n2):
            ent = pool.index.get((la[a], lb[b]))
            if ent is None:
                continue
            starts[k], lens[k] = ent
            a_idx[k], b_idx[k] = a, b
            wts[k] = (
                float(weights[la[a]]) * float(weights[lb[b]]) / total_w
                if weights is not None else 1.0
            )
            k += 1
    return native.profile_posterior(
        l1, l2, starts[:k], lens[:k], a_idx[:k], b_idx[:k], wts[:k],
        pool.r, pool.c, pool.v,
        np.concatenate(maps1) if maps1 else np.zeros(0, np.int32),
        m1_off,
        np.concatenate(maps2) if maps2 else np.zeros(0, np.int32),
        m2_off,
        cutoff_sub,
    )


def build_profile_posterior(
    group1: MSA,
    group2: MSA,
    posts: dict[tuple[int, int], sp.csr_matrix],
    weights: np.ndarray | None = None,
    cutoff_sub: float = 0.0,
    pool: PostPool | None = None,
) -> np.ndarray:
    """Dense (L1, L2) profile posterior by scatter through gap mappings.

    `weights` are ClustalW weights indexed by original label; if None the
    unweighted builder is used (refinement path).  `cutoff_sub` is the
    QuickProbs posteriorCutoff subtraction (w * cutoff removed at every
    mapped cell, ProbabilisticModel.h:1253-1257); the base aligner runs
    with cutoff 0 (MSA.cpp:38).  With a `pool`, the scatter runs in the
    native OpenMP runtime (BuildPosterior, ProbabilisticModel.h:1290).
    """
    if pool is not None:
        out = _native_profile_posterior(
            group1, group2, pool, weights, cutoff_sub
        )
        if out is not None:
            return out
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
    pool: PostPool | None = None,
) -> tuple[MSA, float]:
    """AlignAlignments: profile posterior -> MWT -> merge -> sort."""
    prof = build_profile_posterior(group1, group2, posts, weights,
                                   cutoff_sub=cutoff_sub, pool=pool)
    path, score = mwt_path(prof)
    merged = merge_alignments(group1, group2, path)
    return merged.sort_by_label(), score


def process_tree(
    node: TreeNode,
    seqs_msa: MSA,
    posts: dict[tuple[int, int], sp.csr_matrix],
    weights: np.ndarray,
    cutoff_sub: float = 0.0,
    pool: PostPool | None = None,
) -> MSA:
    if pool is None:
        pool = PostPool(posts)
    if node.leaf:
        return seqs_msa.project([node.idx])
    left = process_tree(node.left, seqs_msa, posts, weights,
                        cutoff_sub, pool)
    right = process_tree(node.right, seqs_msa, posts, weights,
                         cutoff_sub, pool)
    merged, _ = align_profiles(left, right, posts, weights,
                               cutoff_sub, pool)
    return merged


def iterative_refinement_pass(
    alignment: MSA,
    posts: dict[tuple[int, int], sp.csr_matrix],
    rng: GlibcRand,
    pool: PostPool | None = None,
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
    prof = build_profile_posterior(g1, g2, posts, weights=None,
                                   pool=pool)

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
    pool = PostPool(posts)
    alignment = process_tree(root, seqs_msa, posts, weights, pool=pool)

    reps = base_reps
    if pid > 3 or n > 150:
        reps = 0
    if n <= 50:
        reps = 2 * reps
    ineffectiveness = 0
    i = 0
    iter_cutoff = 100
    while i < reps:
        alignment, flag = iterative_refinement_pass(
            alignment, posts, rng, pool=pool
        )
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
