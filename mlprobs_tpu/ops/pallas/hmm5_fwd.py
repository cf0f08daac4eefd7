"""Pallas TPU kernel: 5-state pair-HMM forward pass.

The device-kernel formulation of ops/pairhmm.hmm5_forward — one program
processes a sublane-tile of pairs; rows advance in a fori_loop; the
within-row Y-state recurrence resolves with a Hillis-Steele scan over
the affine log-semiring (log2(L) shifted combines on the VPU), replacing
the reference's anti-diagonal OpenCL wavefront (Kernels/Probabilistic.cl)
with a layout whose vector lanes are the columns of the DP grid.

Lane j of the kernel corresponds to grid column j (0..Ly); emissions are
looked up by one-hot contraction against the 21-class tables.  V1 keeps
the whole (tile, Lx+1, Ly+1) forward plane in VMEM, capping L at ~500
for an 8-pair tile; longer pairs take the XLA scan path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_ZERO = -1e30  # plain float: jnp scalars would be captured consts
TILE = 8          # pairs per program (f32 sublane count)


def _lse(*terms):
    out = terms[0]
    for t in terms[1:]:
        out = jnp.logaddexp(out, t)
    return out


def _shift_right(arr, fill=LOG_ZERO):
    """[a b c] -> [fill a b] along the last (lane) axis."""
    rolled = pltpu.roll(arr, 1, axis=arr.ndim - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, arr.shape, arr.ndim - 1)
    return jnp.where(lane == 0, fill, rolled)


def _affine_scan_log_lanes(c, d):
    """u_j = logaddexp(c_j, d_j + u_{j-1}), u_{-1} = -inf, lane axis."""
    lanes = c.shape[-1]
    cc, dd = c, d
    s = 1
    while s < lanes:
        lane = jax.lax.broadcasted_iota(jnp.int32, c.shape, c.ndim - 1)
        c_prev = pltpu.roll(cc, s, axis=c.ndim - 1)
        d_prev = pltpu.roll(dd, s, axis=c.ndim - 1)
        ok = lane >= s
        c_prev = jnp.where(ok, c_prev, LOG_ZERO)
        d_prev = jnp.where(ok, d_prev, 0.0)
        cc = jnp.logaddexp(cc, dd + c_prev)
        dd = dd + d_prev
        s *= 2
    return cc


def _fwd_kernel(
    x_ref, yg_ref, lx_ref, lmatch_ref, lins_ref, trans_ref, init_ref,
    out_ref, states_ref, onehot_ref,
):
    lx_max = x_ref.shape[1]
    lanes = yg_ref.shape[1]          # Ly + 1 (lane 0 = grid column 0)

    trans = trans_ref[:]
    init = init_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, lanes), 1)
    col0 = lane == 0
    lxs = lx_ref[:, 0]               # (TILE,) per-pair x lengths

    # one-hot of y grid columns: (TILE, lanes, 21); lane 0 one-hots the
    # padded class but every use masks lane 0 explicitly
    ycls = yg_ref[:].astype(jnp.int32)
    cls_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, lanes, 21), 2)
    onehot_ref[:] = (ycls[:, :, None] == cls_iota).astype(jnp.float32)
    oh_flat = onehot_ref[:].reshape(TILE * lanes, 21)

    insy_both = jnp.dot(
        oh_flat, lins_ref[:], preferred_element_type=jnp.float32
    ).reshape(TILE, lanes, 2)
    insy0 = jnp.where(col0, LOG_ZERO, insy_both[:, :, 0])
    insy1 = jnp.where(col0, LOG_ZERO, insy_both[:, :, 1])

    zero_row = jnp.full((TILE, lanes), LOG_ZERO)

    # ---- row 0: only Y states, injected at grid column 1
    def y0_row(k, insy):
        c = jnp.where(lane == 1, init[2 * k + 2] + insy, LOG_ZERO)
        d = insy + trans[2 * k + 2, 2 * k + 2]
        return _affine_scan_log_lanes(c, d)

    carry0 = (
        zero_row, zero_row, y0_row(0, insy0), zero_row, y0_row(1, insy1),
        zero_row, zero_row, zero_row, zero_row, zero_row,  # states@lx
    )
    out_ref[:, 0, :] = zero_row

    def body(i, carry):
        m, x1, y1, x2, y2, sm, sx1, sy1, sx2, sy2 = carry

        xcls = x_ref[:, i - 1].astype(jnp.int32)
        xoh = (
            xcls[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (TILE, 21), 1)
        ).astype(jnp.float32)
        lrow = jnp.dot(
            xoh, lmatch_ref[:], preferred_element_type=jnp.float32
        )                                               # (TILE, 21)
        em = jnp.einsum(
            "blc,bc->bl", onehot_ref[:], lrow,
            preferred_element_type=jnp.float32,
        )
        em = jnp.where(col0, LOG_ZERO, em)
        insx = jnp.dot(
            xoh, lins_ref[:], preferred_element_type=jnp.float32
        )                                               # (TILE, 2)
        insx0 = insx[:, 0][:, None]
        insx1 = insx[:, 1][:, None]

        rec = _lse(
            _shift_right(m) + trans[0, 0],
            _shift_right(x1) + trans[1, 0],
            _shift_right(y1) + trans[2, 0],
            _shift_right(x2) + trans[3, 0],
            _shift_right(y2) + trans[4, 0],
        )
        inj_m = jnp.where((i == 1) & (lane == 1), init[0], LOG_ZERO)
        m_new = em + jnp.logaddexp(rec, inj_m)

        def x_state(k, prev_x, insx_k):
            inj = jnp.where((i == 1) & col0, init[2 * k + 1], LOG_ZERO)
            return insx_k + _lse(
                m + trans[0, 2 * k + 1],
                prev_x + trans[2 * k + 1, 2 * k + 1],
                inj,
            )

        x1_new = x_state(0, x1, insx0)
        x2_new = x_state(1, x2, insx1)

        def y_state(k, prev_shifted, insy):
            c = insy + trans[0, 2 * k + 2] + prev_shifted
            d = insy + trans[2 * k + 2, 2 * k + 2]
            return _affine_scan_log_lanes(c, d)

        m_shift = _shift_right(m_new)
        y1_new = y_state(0, m_shift, insy0)
        y2_new = y_state(1, m_shift, insy1)

        out_ref[:, i, :] = m_new

        at_lx = (lxs == i)[:, None]
        sm = jnp.where(at_lx, m_new, sm)
        sx1 = jnp.where(at_lx, x1_new, sx1)
        sy1 = jnp.where(at_lx, y1_new, sy1)
        sx2 = jnp.where(at_lx, x2_new, sx2)
        sy2 = jnp.where(at_lx, y2_new, sy2)
        return (m_new, x1_new, y1_new, x2_new, y2_new,
                sm, sx1, sy1, sx2, sy2)

    carry = jax.lax.fori_loop(1, lx_max + 1, body, carry0)
    _, _, _, _, _, sm, sx1, sy1, sx2, sy2 = carry
    states_ref[:, 0, :] = sm
    states_ref[:, 1, :] = sx1
    states_ref[:, 2, :] = sy1
    states_ref[:, 3, :] = sx2
    states_ref[:, 4, :] = sy2


@functools.partial(jax.jit, static_argnames=("interpret",))
def hmm5_forward_pallas(x, y, lx, lmatch, lins, trans, init,
                        interpret: bool = False):
    """Batched forward pass.

    x: (B, Lx) int8; y: (B, Ly) int8; lx: (B,) int32 per-pair x lengths.
    Returns (fM plane (B, Lx+1, Ly+1), states_at_lx (B, 5, Ly+1)):
    fM[:, i, j] is the forward M value at grid cell (i, j);
    states_at_lx[:, k, j] holds state k of row lx at column j — index it
    at j = ly on the host for the terminal cell.
    """
    b, lx_max = x.shape
    ly = y.shape[1]
    lanes = ly + 1
    assert b % TILE == 0
    grid = (b // TILE,)
    # lane 0 = grid column 0: pad with the unknown class (never read)
    ygrid = jnp.concatenate(
        [jnp.full((b, 1), 20, y.dtype), y], axis=1
    )
    lx2d = lx.astype(jnp.int32)[:, None]
    init2d = init[None, :]
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, lx_max), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, lanes), lambda g: (g, 0),
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
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, lx_max + 1, lanes), jnp.float32),
            jax.ShapeDtypeStruct((b, 5, lanes), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, lanes, 21), jnp.float32),
        ],
        interpret=interpret,
    )(x, ygrid, lx2d, lmatch, lins, trans, init2d)
