"""3-state local-model Viterbi alignment (percent-identity features).

Reference: ProbabilisticModel.h ComputeViterbiAlignment (:1043+), the
all-pairs engine behind the `-G` feature pass and ModelAdjustmentTest
(MSA.cpp:646-882).  Uses the local transition matrix, raw match/insert
emissions, and a fixed initial distribution; ties prefer the earlier state
(M > X > Y).

Device side fills the DP and emits packed direction bits; the traceback is
a short host loop (see mlprobs_tpu.align.traceback).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mlprobs_tpu.ops.semiring import LOG_ZERO, affine_scan_max, shift_right

import numpy as np

# fixed Viterbi initial distribution (ProbabilisticModel.h:1075-1077)
VIT_INIT = np.log(np.array([0.6080327034, 0.1959836632, 0.1959836632],
                           dtype=np.float64)).astype(np.float32)


def viterbi_local(x, y, lx, ly, p):
    """Run the Viterbi DP.

    Returns (dirs, end_state, score):
      dirs: (Lx+1, Ly+1) int8, bit-packed per cell:
            bits 0-1 = M-state predecessor (0/1/2),
            bit 2    = X-state predecessor is X (else M),
            bit 3    = Y-state predecessor is Y (else M).
      end_state: int32 best final state at (lx, ly).
      score: float32 best final log score.
    """
    Lx, Ly = x.shape[0], y.shape[0]
    lt = p["trans"]
    lm = p["lmatch"][x[:, None], y[None, :]]          # (Lx, Ly)
    lm = jnp.concatenate([jnp.full((Lx, 1), LOG_ZERO), lm], axis=1)
    lix = p["lins"][x]                                # (Lx,)
    liy = jnp.concatenate(
        [jnp.full(1, LOG_ZERO), p["lins"][y]]
    )                                                 # (Ly+1,)
    jidx = jnp.arange(Ly + 1)
    zero_row = jnp.full(Ly + 1, LOG_ZERO)
    vinit = jnp.asarray(VIT_INIT)

    # row 0: (0,0) holds the initial distribution; Y-chain extends right
    m0 = jnp.where(jidx == 0, vinit[0], LOG_ZERO)
    x0 = jnp.where(jidx == 0, vinit[1], LOG_ZERO)
    c = liy + lt[0, 2] + shift_right(m0, LOG_ZERO)
    d = liy + lt[2, 2]
    y0 = jnp.concatenate(
        [vinit[2][None], affine_scan_max(c[1:], d[1:], init=vinit[2])]
    )
    tb_y0 = (
        shift_right(m0) + lt[0, 2] < shift_right(y0) + lt[2, 2]
    ).astype(jnp.int32)
    dirs0 = (8 * tb_y0).astype(jnp.int8)

    def step(carry, i):
        pM, pX, pY = carry
        # M: diagonal predecessors, first-wins tie-break M > X > Y
        cm = shift_right(pM) + lt[0, 0]
        cx = shift_right(pX) + lt[1, 0]
        cy = shift_right(pY) + lt[2, 0]
        best = jnp.maximum(jnp.maximum(cm, cx), cy)
        M = lm[i - 1] + best
        M = jnp.where(jidx >= 1, M, LOG_ZERO)
        tb_m = jnp.where(
            (cm >= cx) & (cm >= cy), 0, jnp.where(cx >= cy, 1, 2)
        )
        # X: vertical, prefer M on ties
        from_m = pM + lt[0, 1]
        from_x = pX + lt[1, 1]
        X = lix[i - 1] + jnp.maximum(from_m, from_x)
        tb_x = (from_m < from_x).astype(jnp.int32)
        # Y: horizontal within-row recurrence
        Mshift = shift_right(M)
        cyr = liy + lt[0, 2] + Mshift
        dyr = liy + lt[2, 2]
        Y = jnp.concatenate(
            [zero_row[:1], affine_scan_max(cyr[1:], dyr[1:])]
        )
        Yshift = shift_right(Y)
        tb_y = (Mshift + lt[0, 2] < Yshift + lt[2, 2]).astype(jnp.int32)
        dirs = (tb_m + 4 * tb_x + 8 * tb_y).astype(jnp.int8)
        return (M, X, Y), (dirs, jnp.stack([M[ly], X[ly], Y[ly]]))

    _, (dir_rows, ends) = jax.lax.scan(
        step, (m0, x0, y0), jnp.arange(1, Lx + 1)
    )
    dirs = jnp.concatenate([dirs0[None, :], dir_rows], axis=0)
    end0 = jnp.stack([m0[ly], x0[ly], y0[ly]])
    ends = jnp.concatenate([end0[None, :], ends], axis=0)[lx]
    final = ends + vinit
    # first-wins argmax with strict improvement (M preferred)
    end_state = jnp.where(
        (final[0] >= final[1]) & (final[0] >= final[2]),
        0,
        jnp.where(final[1] >= final[2], 1, 2),
    )
    return dirs, end_state, final[end_state]
