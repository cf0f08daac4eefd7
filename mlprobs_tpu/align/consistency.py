"""Probabilistic-consistency transform.

Reference: MSA::DoRelaxation (MSA.cpp:1172-1281):

    P'(x,y) = (2 P(x,y) + sum_{z != x,y} P(x,z) P(z,y)) / N

masked to the original sparsity support and re-thresholded at 0.01.

Two equivalent implementations:

* `relax_sparse` (host): one product of the big (sum(L) x sum(L)) block
  matrix Q with identity diagonal blocks — Q^2 block (i,j) is exactly
  2 P_ij + sum_z P_iz P_zj.  scipy CSR; used by the CPU path and as the
  oracle.
* `relax_dense` (device): the same contraction as a z-chunked batched
  matmul over a dense (N, N, Lp, Lp) posterior tensor — the MXU path.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

CUTOFF = 0.01  # SparseMatrix.h:14


def sparsify(post: np.ndarray, cutoff: float = CUTOFF) -> sp.csr_matrix:
    """Threshold a dense posterior plane into CSR (values >= cutoff)."""
    keep = post >= cutoff
    out = sp.csr_matrix(np.where(keep, post, 0.0))
    out.eliminate_zeros()
    return out


def _block_matrix(
    posts: dict[tuple[int, int], sp.csr_matrix], lengths: list[int]
) -> sp.csr_matrix:
    n = len(lengths)
    blocks: list[list] = [[None] * n for _ in range(n)]
    for i in range(n):
        blocks[i][i] = sp.identity(lengths[i], format="csr")
    for (i, j), s in posts.items():
        blocks[i][j] = s
        blocks[j][i] = s.T.tocsr()
    return sp.bmat(blocks, format="csr")


def relax_sparse(
    posts: dict[tuple[int, int], sp.csr_matrix],
    lengths: list[int],
    reps: int = 2,
    cutoff: float = CUTOFF,
) -> dict[tuple[int, int], sp.csr_matrix]:
    """`reps` rounds of the consistency transform on CSR posteriors."""
    n = len(lengths)
    offs = np.concatenate([[0], np.cumsum(lengths)])
    current = posts
    for _ in range(reps):
        q = _block_matrix(current, lengths)
        r = (q @ q) / n
        # mask to the original off-diagonal support
        pattern = _block_matrix(current, lengths)
        pattern.setdiag(0)
        pattern.eliminate_zeros()
        pattern.data[:] = 1.0
        r = r.multiply(pattern).tocsr()
        r.data[r.data < cutoff] = 0.0
        r.eliminate_zeros()
        new = {}
        for (i, j) in current:
            blk = r[offs[i] : offs[i + 1], offs[j] : offs[j + 1]].tocsr()
            new[(i, j)] = blk
        current = new
    return current


def relax_sparse_weighted(
    posts: dict[tuple[int, int], sp.csr_matrix],
    lengths: list[int],
    weights: np.ndarray,
    reps: int = 2,
    selfweight: float = 3.0,
    selectivity: float = 200.0,
    cutoff: float = CUTOFF,
) -> dict[tuple[int, int], sp.csr_matrix]:
    """QuickProbs-style weighted relaxation (ConsistencyStage.cpp:133-259).

    P'_ij = (P_ij + sum_z (w_z / W_ij) P_iz P_zj) / sumW_ij with
    W_ij = (1 + (selfweight-1) * accepted/selectivity) * (w_i + w_j),
    masked to the original support and re-thresholded.  The stochastic
    z-filter accepts everything for families smaller than `selectivity`
    (the realign-block regime); the filtered variant lands with the
    large-family path.
    """
    n = len(lengths)
    offs = np.concatenate([[0], np.cumsum(lengths)])
    w = np.asarray(weights, dtype=np.float64)
    current = posts
    for _ in range(reps):
        # block matrix with ZERO diagonal (self terms added explicitly)
        blocks: list[list] = [[None] * n for _ in range(n)]
        for (i, j), s in current.items():
            blocks[i][j] = s
            blocks[j][i] = s.T.tocsr()
        q = sp.bmat(blocks, format="csr")
        wdiag = sp.diags(
            np.concatenate([np.full(lengths[z], w[z]) for z in range(n)])
        )
        r = q @ wdiag @ q
        new = {}
        accepted = n - 2
        for (i, j), s in current.items():
            wij = (1.0 + (selfweight - 1.0) * accepted / selectivity)
            wij *= w[i] + w[j]
            sum_w = 1.0 + sum(
                w[z] for z in range(n) if z not in (i, j)
            ) / wij
            blk = r[offs[i]:offs[i + 1], offs[j]:offs[j + 1]].tocsr()
            out = (s + blk / wij) / sum_w
            out = out.multiply(s > 0).tocsr()
            out.data[out.data < cutoff] = 0.0
            out.eliminate_zeros()
            new[(i, j)] = out
        current = new
    return current


def relax_dense_device(post_tensor, num_seqs: int, cutoff: float = CUTOFF):
    """One consistency round on a dense (N, N, Lp, Lp) tensor (jnp).

    post_tensor must already have identity diagonal blocks and transposed
    lower blocks; returns the re-thresholded tensor with identity diagonal
    restored.  Runs the contraction as a z-chunked einsum on the MXU.
    """
    import jax.numpy as jnp

    s = post_tensor
    n = s.shape[0]
    r = jnp.einsum(
        "izab,zjbc->ijac", s, s, preferred_element_type=jnp.float32
    ) / num_seqs
    support = s >= cutoff
    eye = jnp.eye(n, dtype=bool)[:, :, None, None]
    r = jnp.where(support & ~eye, r, 0.0)
    r = jnp.where(r >= cutoff, r, 0.0)
    lp = s.shape[-1]
    ident = jnp.eye(lp)[None, None, :, :] * eye
    return r + ident
