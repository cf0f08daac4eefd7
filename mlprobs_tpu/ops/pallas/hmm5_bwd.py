"""Pallas TPU kernel: 5-state pair-HMM backward pass + fused posterior.

Mirrors ops/pairhmm.hmm5_backward: rows walk bottom-up, contributions
that would consume padded positions are masked, and the terminal
injection lands at the per-pair (lx, ly) cell.  The fused entry point
runs forward + backward kernels and combines them into the match
posterior with plain XLA elementwise ops (device-resident throughout).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlprobs_tpu.ops.pallas.hmm5_fwd import (
    LOG_ZERO,
    TILE,
    _affine_scan_log_lanes,
    _lse,
    hmm5_forward_pallas,
)


def _shift_left(arr, fill=LOG_ZERO):
    """[a b c] -> [b c fill] along the last (lane) axis."""
    lanes = arr.shape[-1]
    rolled = pltpu.roll(arr, lanes - 1, axis=arr.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, arr.shape, arr.ndim - 1)
    return jnp.where(lane == lanes - 1, fill, rolled)


def _affine_scan_log_lanes_rev(c, d):
    """u_j = logaddexp(c_j, d_j + u_{j+1}), u_{lanes} = -inf."""
    lanes = c.shape[-1]
    cc, dd = c, d
    s = 1
    while s < lanes:
        lane = jax.lax.broadcasted_iota(jnp.int32, c.shape, c.ndim - 1)
        c_next = pltpu.roll(cc, lanes - s, axis=c.ndim - 1)
        d_next = pltpu.roll(dd, lanes - s, axis=c.ndim - 1)
        ok = lane < lanes - s
        c_next = jnp.where(ok, c_next, LOG_ZERO)
        d_next = jnp.where(ok, d_next, 0.0)
        cc = jnp.logaddexp(cc, dd + c_next)
        dd = dd + d_next
        s *= 2
    return cc


def _bwd_kernel(
    x_ref, yg_ref, lx_ref, ly_ref, lmatch_ref, lins_ref, trans_ref,
    init_ref, out_ref, row1_ref, row0_ref, onehot_ref,
):
    lx_max = x_ref.shape[1]
    lanes = yg_ref.shape[1]

    trans = trans_ref[:]
    init = init_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, lanes), 1)
    lxs = lx_ref[:, 0]
    lys = ly_ref[:, 0]
    yvalid = lane < lys[:, None]        # consuming y at column j+1 ok

    ycls = yg_ref[:].astype(jnp.int32)
    cls_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, lanes, 21), 2)
    onehot_ref[:] = (ycls[:, :, None] == cls_iota).astype(jnp.float32)
    oh_flat = onehot_ref[:].reshape(TILE * lanes, 21)
    insy_grid = jnp.dot(
        oh_flat, lins_ref[:], preferred_element_type=jnp.float32
    ).reshape(TILE, lanes, 2)
    # emission of y at column j+1, laid out at lane j
    insy0_next = _shift_left(insy_grid[:, :, 0])
    insy1_next = _shift_left(insy_grid[:, :, 1])

    zero_row = jnp.full((TILE, lanes), LOG_ZERO)

    def body(step, carry):
        nM, nX1, nY1, nX2, nY2 = carry
        i = lx_max - step                   # rows lx_max .. 0
        xvalid = (i < lxs)[:, None]         # consuming x at row i+1 ok
        at_term = (i == lxs)[:, None]
        inj_lane = at_term & (lane == lys[:, None])

        # match(i+1, j+1) at lane j (x char index i, clamped)
        xcls = x_ref[:, jnp.minimum(i, lx_max - 1)].astype(jnp.int32)
        xoh = (
            xcls[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (TILE, 21), 1)
        ).astype(jnp.float32)
        lrow = jnp.dot(
            xoh, lmatch_ref[:], preferred_element_type=jnp.float32
        )
        em = jnp.einsum(
            "blc,bc->bl", onehot_ref[:], lrow,
            preferred_element_type=jnp.float32,
        )
        em_next = _shift_left(em)
        insx = jnp.dot(
            xoh, lins_ref[:], preferred_element_type=jnp.float32
        )
        insx0 = insx[:, 0][:, None]
        insx1 = insx[:, 1][:, None]

        mterm = jnp.where(
            xvalid & yvalid, em_next + _shift_left(nM), LOG_ZERO
        )

        def y_state(k, insy_n):
            inj = jnp.where(inj_lane, init[2 * k + 2], LOG_ZERO)
            c = jnp.logaddexp(mterm + trans[2 * k + 2, 0], inj)
            d = jnp.where(
                yvalid,
                insy_n + trans[2 * k + 2, 2 * k + 2],
                LOG_ZERO,
            )
            return _affine_scan_log_lanes_rev(c, d)

        y1 = y_state(0, insy0_next)
        y2 = y_state(1, insy1_next)

        def x_state(k, nXk, insx_k):
            inj = jnp.where(inj_lane, init[2 * k + 1], LOG_ZERO)
            return _lse(
                mterm + trans[2 * k + 1, 0],
                jnp.where(
                    xvalid,
                    insx_k + nXk + trans[2 * k + 1, 2 * k + 1],
                    LOG_ZERO,
                ),
                inj,
            )

        x1 = x_state(0, nX1, insx0)
        x2 = x_state(1, nX2, insx1)

        m = _lse(
            mterm + trans[0, 0],
            jnp.where(xvalid, insx0 + nX1 + trans[0, 1], LOG_ZERO),
            jnp.where(xvalid, insx1 + nX2 + trans[0, 3], LOG_ZERO),
            jnp.where(yvalid, insy0_next + _shift_left(y1) + trans[0, 2],
                      LOG_ZERO),
            jnp.where(yvalid, insy1_next + _shift_left(y2) + trans[0, 4],
                      LOG_ZERO),
            jnp.where(inj_lane, init[0], LOG_ZERO),
        )

        out_ref[:, i, :] = m

        @pl.when(i == 1)
        def _():
            row1_ref[:, 0, :] = m
            row1_ref[:, 1, :] = x1
            row1_ref[:, 2, :] = y1
            row1_ref[:, 3, :] = x2
            row1_ref[:, 4, :] = y2

        @pl.when(i == 0)
        def _():
            row0_ref[:, 0, :] = m
            row0_ref[:, 1, :] = x1
            row0_ref[:, 2, :] = y1
            row0_ref[:, 3, :] = x2
            row0_ref[:, 4, :] = y2

        return m, x1, y1, x2, y2

    jax.lax.fori_loop(
        0, lx_max + 1, body, (zero_row,) * 5
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def hmm5_backward_pallas(x, y, lx, ly, lmatch, lins, trans, init,
                         interpret: bool = False):
    """Backward pass.  Returns (bM plane (B, Lx+1, Ly+1),
    row1/row0 state planes (B, 5, Ly+1))."""
    b, lx_max = x.shape
    lanes = y.shape[1] + 1
    assert b % TILE == 0
    ygrid = jnp.concatenate(
        [jnp.full((b, 1), 20, y.dtype), y], axis=1
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid=(b // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, lx_max), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, lanes), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, lx_max + 1, lanes), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 5, lanes), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 5, lanes), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lx_max + 1, lanes), jnp.float32),
            jax.ShapeDtypeStruct((b, 5, lanes), jnp.float32),
            jax.ShapeDtypeStruct((b, 5, lanes), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, lanes, 21), jnp.float32),
        ],
        interpret=interpret,
    )(x, ygrid, lx.astype(jnp.int32)[:, None],
      ly.astype(jnp.int32)[:, None], lmatch, lins, trans, init[None, :])


def hmm5_posterior_pallas(x, y, lx, ly, p, interpret: bool = False):
    """Fused match-posterior via the forward+backward kernels.

    Returns a (B, Lx, Ly) plane matching ops/pairhmm.hmm5_posterior.
    """
    lmatch, lins, trans, init = (
        p["lmatch"], p["lins"], p["trans"], p["init"]
    )
    b, lx_max = x.shape
    ly_max = y.shape[1]
    fm, fstates = hmm5_forward_pallas(
        x, y, lx, lmatch, lins, trans, init, interpret=interpret
    )
    bm, row1, row0 = hmm5_backward_pallas(
        x, y, lx, ly, lmatch, lins, trans, init, interpret=interpret
    )
    bidx = jnp.arange(b)
    total_f = jax.scipy.special.logsumexp(
        fstates[bidx, :, ly] + init[None, :], axis=1
    )
    m11 = lmatch[x[:, 0], y[:, 0]]
    total_b = _lse(
        bm[:, 1, 1] + init[0] + m11,
        row1[:, 1, 0] + init[1] + lins[x[:, 0], 0],
        row1[:, 3, 0] + init[3] + lins[x[:, 0], 1],
        row0[:, 2, 1] + init[2] + lins[y[:, 0], 0],
        row0[:, 4, 1] + init[4] + lins[y[:, 0], 1],
    )
    total = 0.5 * (total_f + total_b)
    post = jnp.exp(
        jnp.minimum(0.0, fm + bm - total[:, None, None])
    )[:, 1:, 1:]
    ivalid = jnp.arange(lx_max)[None, :, None] < lx[:, None, None]
    jvalid = jnp.arange(ly_max)[None, None, :] < ly[:, None, None]
    return jnp.where(ivalid & jvalid, post, 0.0)
