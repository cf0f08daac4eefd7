"""Maximum-weight-trace alignment DP (maximum expected accuracy).

Reference: ProbabilisticModel.h ComputeAlignment (:804-864).  Gap moves
cost nothing, so the within-row recurrence

    S(i,j) = max(p(i,j) + S(i-1,j-1), S(i,j-1), S(i-1,j))

collapses to a running maximum: with a_j = max(p + S_up_diag, S_up),
S(i,:) is simply cummax(a).  Tie-breaking reproduces ChooseBestOfThree
(ScoreType.h:347-366): diagonal >= left >= up.

Device fills scores + directions; the traceback is a host loop
(mlprobs_tpu.align.traceback.mwt_traceback).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mwt_align(post, lx, ly):
    """Fill the MWT DP over a 0-based posterior plane.

    post: (Lx, Ly) float32 (posterior[i-1, j-1] = p(i, j)).
    Returns (dirs (Lx+1, Ly+1) int8 with 0=diag,1=left,2=up; score float32).
    """
    Lx, Ly = post.shape
    jidx = jnp.arange(Ly + 1)
    p_rows = jnp.concatenate(
        [jnp.zeros((Lx, 1), post.dtype), post], axis=1
    )                                               # (Lx, Ly+1)

    def step(carry, i):
        s_prev = carry
        p = p_rows[i - 1]
        up_diag = jnp.concatenate([jnp.zeros(1), s_prev[:-1]])
        pd = p + up_diag                            # diagonal candidate
        up = s_prev                                 # up candidate
        a = jnp.maximum(pd, up)
        s = jax.lax.associative_scan(jnp.maximum, a)
        s = s.at[0].set(0.0)
        left = jnp.concatenate([jnp.zeros(1), s[:-1]])  # = new[j-1]
        dirs = jnp.where(
            (pd >= left) & (pd >= up),
            0,
            jnp.where(left >= up, 1, 2),
        )
        dirs = dirs.at[0].set(2)                    # column 0: up
        return s, (dirs.astype(jnp.int8), s[ly])

    s0 = jnp.zeros(Ly + 1)
    _, (dir_rows, scores) = jax.lax.scan(
        step, s0, jnp.arange(1, Lx + 1)
    )
    dirs0 = jnp.ones(Ly + 1, jnp.int8)              # row 0: left
    dirs = jnp.concatenate([dirs0[None, :], dir_rows], axis=0)
    scores = jnp.concatenate([jnp.zeros(1), scores])
    return dirs, scores[lx]


def count_matches(dirs, lx, ly):
    """Number of diagonal ('B') moves on the traceback from (lx, ly).

    Device-side traceback via lax.while_loop — used by the
    non-progressive path's distance = score / #matches
    (MSA.cpp:1745-1752) without hauling the direction matrix to host.
    """

    def cond(state):
        r, c, _ = state
        return (r > 0) | (c > 0)

    def body(state):
        r, c, nb = state
        d = dirs[r, c]
        r2 = jnp.where(d == 1, r, r - 1)
        c2 = jnp.where(d == 2, c, c - 1)
        return r2, c2, nb + jnp.where(d == 0, 1, 0)

    _, _, nb = jax.lax.while_loop(
        cond, body, (lx, ly, jnp.int32(0))
    )
    return nb
