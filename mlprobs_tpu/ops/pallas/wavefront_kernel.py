"""Fused Pallas TPU kernels for the wavefront posterior stage.

The lax.scan engine (ops/wavefront.py) is HBM-bound: every diagonal
step re-materialises (B, W, 21) one-hot/emission tensors and round-trips
all DP state rows through HBM (~100 MB per diagonal at B=512, Lp=512).
These kernels keep the DP state resident in VMEM across the whole
anti-diagonal sweep and touch HBM only for the pre-skewed sequence
classes (int8, streamed in) and the emitted plane rows (streamed out) —
the TPU analogue of the reference's OpenCL wavefront kernels
(Kernels/Probabilistic[_long].cl, Partition*.cl, Finalization*.cl) with
pairs batched across VPU sublanes instead of workgroups.

Three-phase structure (totals must be known before posteriors):

1. `sweep` (rev): forward recurrences on reversed sequences, emitting
   pre-emission planes + per-diagonal scales + total probabilities.
2. `sweep` (fwd): same kernel, post-emission planes.
3. `combine`: reads both plane sets row-by-row (the rev rows through a
   double-buffered HBM DMA with the static row/lane remap), computes
   the per-model posteriors, RMS-combines, runs the MWT accuracy DP and
   writes the combined posterior plane (Finalization.cl's role).

Numerics mirror ops/wavefront.py exactly: scaled probability space with
per-diagonal exact power-of-two rescaling, identical injections and
tie-breaks, f32 throughout.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 20
TINY = 1e-38


def _pow2i(e):
    """Exact 2**e for integer-valued f32 `e` via exponent-field
    construction (clamped to the normal range): power-of-two scaling
    must be lossless or the scaled-probability bookkeeping drifts."""
    ei = jnp.clip(e, -126.0, 127.0).astype(jnp.int32)
    return pltpu.bitcast((ei + 127) << 23, jnp.float32)


def _floor_log2(mx):
    """Exact floor(log2(mx)) for positive normal f32 via the exponent
    field (zero where mx <= 0)."""
    eb = (
        jax.lax.shift_right_logical(
            pltpu.bitcast(mx, jnp.int32), 23
        ) & 0xFF
    ) - 127
    return jnp.where(mx > 0, eb.astype(jnp.float32), 0.0)
LOG2_TINY = float(np.log2(TINY))
# diagonals per grid step: 16 amortises per-step grid overhead ~9% over
# 8 on v5e; 32+ balloons Mosaic compile time (the body unrolls CH
# diagonals) for no further gain
CH = 16
SCALE_LANE_OFF = 8  # scale rides in plane lane W - 1 + SCALE_LANE_OFF


def _wpad(lp: int) -> int:
    """Padded lane count: W = lp + 1 rounded up to the 128-lane tile.

    The scale lane (lp + SCALE_LANE_OFF) always fits in the same tile
    because lp is a multiple of the 128 length bucket; the combine
    kernel's rev-row roll is circular, needing no extra slack."""
    return ((lp + 1 + 127) // 128) * 128


def _dpad(lp: int) -> int:
    """Plane rows: D = 2*lp + 1 plus two zero rows the combine kernel's
    rev remap reads (rows 2*lp+1, 2*lp+2), rounded up to CH."""
    return ((2 * lp + 3 + CH - 1) // CH) * CH


def _block_pairs(lp: int) -> int:
    # measured on v5e at Lp=512: 64 pairs/block beats 32 by ~8% (wider
    # sublane tiles); halve per tier to hold the VMEM state footprint
    if lp <= 512:
        return 64
    if lp <= 1024:
        return 32
    return 16


# ---------------------------------------------------------------------------
# Host-side preparation
# ---------------------------------------------------------------------------


def skew_classes(xp: jnp.ndarray, lp: int) -> jnp.ndarray:
    """(B, Lp) int8 -> (Dp, B, Wp) int8 pre-skewed x classes.

    Row d, lane j holds the class of x_{d-j} (1-indexed grid), PAD
    outside — exactly the sliding window the scan engine dynamic-slices
    per step (ops/wavefront.py), materialised once so the kernel's inner
    loop is free of unaligned lane slices.
    """
    b = xp.shape[0]
    wp, dp = _wpad(lp), _dpad(lp)
    padb = jnp.full((b, lp + 1), PAD, xp.dtype)
    xfeed = jnp.concatenate([padb, xp[:, ::-1], padb], axis=1)
    # xrow(d)[j] = xfeed[2*lp + 1 - d + j]
    d_idx = jnp.arange(dp, dtype=jnp.int32)[:, None]
    j_idx = jnp.arange(wp, dtype=jnp.int32)[None, :]
    src = jnp.clip(2 * lp + 1 - d_idx + j_idx, 0, xfeed.shape[1] - 1)
    valid = (2 * lp + 1 - d_idx + j_idx >= 0) & (
        2 * lp + 1 - d_idx + j_idx < xfeed.shape[1]
    )
    out = xfeed[:, src]                      # (B, Dp, Wp)
    out = jnp.where(valid[None], out, PAD)
    return jnp.moveaxis(out, 0, 1)           # (Dp, B, Wp)


def lane_tables(yp: jnp.ndarray, pm: jnp.ndarray, lp: int) -> jnp.ndarray:
    """colt[c, b, j] = pm[c, y_j] with y 1-indexed (lane 0 = PAD).

    Class-major layout so the kernel's per-class select reads one
    contiguous (B, Wp) tile per class."""
    b = yp.shape[0]
    wp = _wpad(lp)
    ygrid = jnp.concatenate(
        [jnp.full((b, 1), PAD, yp.dtype), yp,
         jnp.full((b, wp - lp - 1), PAD, yp.dtype)], axis=1
    )                                          # (B, Wp)
    return pm[:, ygrid.astype(jnp.int32)]      # (21, B, Wp)


def pair_meta(ox, oy, lx, ly) -> jnp.ndarray:
    """(B, 128) int32 metadata: cols 0..4 = ox, oy, lx, ly, dterm."""
    cols = [ox, oy, lx, ly, ox + lx + oy + ly]
    meta = jnp.stack([c.astype(jnp.int32) for c in cols], axis=1)
    pad = jnp.zeros((meta.shape[0], 128 - meta.shape[1]), jnp.int32)
    return jnp.concatenate([meta, pad], axis=1)


# ---------------------------------------------------------------------------
# Sweep kernel
# ---------------------------------------------------------------------------

# state-row layout in the VMEM scratch, per model (d1 = diagonal d-1,
# d2 = diagonal d-2)
_NSTATE = {"hmm5": 5, "local": 3, "partition": 3}
# scalar scratch rows (lane 0 used), per model:
#   0: s1   1: s2   2: r   3: sterm   4: acc/log2t   5..: term states
_NSCAL = {"hmm5": 5 + 5, "local": 5, "partition": 5 + 3}


def _state_offsets(models):
    offs, total = {}, 0
    for m in models:
        offs[m] = total
        total += 2 * _NSTATE[m]
    return offs, total


def _scal_offsets(models):
    offs, total = {}, 0
    for m in models:
        offs[m] = total
        total += _NSCAL[m]
    return offs, total


def _sweep_kernel_body(
    models, lp, emit_pre, consts,
    # refs
    xsk_ref, colt_refs, meta_ref,
    plane_refs, l2t_refs,
    st_ref, sc_ref, xr_ref,
    colt_hbm, colt_scr, colt_sem,
):
    """Grid step: CH diagonals for one pair block."""
    dc = pl.program_id(1)
    ib = pl.program_id(0)
    nbb = colt_scr.shape[2]
    wp = _wpad(lp)
    dmax = 2 * lp + 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    soffs, _ = _state_offsets(models)
    koffs, _ = _scal_offsets(models)
    h5 = "hmm5" in models

    ox = meta_ref[:, 0:1]
    oy = meta_ref[:, 1:2]
    lx = meta_ref[:, 2:3]
    ly = meta_ref[:, 3:4]
    dterm = meta_ref[:, 4:5]
    lane_oy = (lane == oy).astype(jnp.float32)
    lane_oy1 = (lane == oy + 1).astype(jnp.float32)
    lane_end = lane == (oy + ly)
    term_sel = lane_end.astype(jnp.float32)

    @pl.when(dc == 0)
    def _():
        st_ref[...] = jnp.zeros_like(st_ref)
        sc_ref[...] = jnp.zeros_like(sc_ref)
        xr_ref[...] = jnp.full_like(xr_ref, PAD)
        for m in models:
            k0 = koffs[m]
            sc_ref[k0 + 2] = jnp.ones_like(sc_ref[0])  # r = 1
            if m == "local":
                sc_ref[k0 + 4] = jnp.full_like(sc_ref[0], -jnp.inf)
        for mi in range(len(models)):
            pltpu.make_async_copy(
                colt_hbm[mi].at[:, pl.ds(ib * nbb, nbb), :],
                colt_scr.at[mi],
                colt_sem.at[mi],
            ).start()
        for mi in range(len(models)):
            pltpu.make_async_copy(
                colt_hbm[mi].at[:, pl.ds(ib * nbb, nbb), :],
                colt_scr.at[mi],
                colt_sem.at[mi],
            ).wait()

    lane0 = lane == 0

    def shift1(v):
        r = pltpu.roll(v, shift=1, axis=1)
        return jnp.where(lane0, 0.0, r)

    # The x window slides one lane per diagonal: maintain it
    # incrementally in scratch (xrow(d) = roll(xrow(d-1), 1) with
    # xfeed[2*lp+1-d] injected at lane 0).  Mosaic only allows lane
    # slices at provably 128-aligned offsets, so the chunk's eight
    # injected columns are read from one aligned 256-lane block via a
    # masked reduction.
    d0 = dc * CH
    base = jnp.maximum(((2 * lp - (CH - 2) - d0) // 128) * 128, 0)
    base = pl.multiple_of(base, 128)
    newblk = xsk_ref[:, pl.ds(base, 256)].astype(jnp.int32)
    lane256 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)

    for k in range(CH):
        d = dc * CH + k
        col = 2 * lp + 1 - d
        # col < 0 (diagonals past 2*lp+1 in the padded plane) matches no
        # lane: inject PAD, not the masked-sum default 0 (class 0 is a
        # real residue — it would feed phantom emissions into the local
        # model's every-diagonal total accumulator).
        hit = lane256 == col - base
        inj = jnp.sum(jnp.where(hit, newblk, 0), axis=1, keepdims=True)
        inj = jnp.where(
            jnp.sum(hit.astype(jnp.int32), axis=1, keepdims=True) > 0,
            inj, PAD,
        )
        prev = xr_ref[...]
        xrow = jnp.where(
            lane == 0, inj, pltpu.roll(prev, shift=1, axis=1)
        )
        xr_ref[...] = xrow
        at_term = (d == dterm).astype(jnp.float32)

        # emission rows for every model (+ hmm5 insert emissions) in one
        # 21-class select sweep
        em = {m: jnp.zeros_like(st_ref[0]) for m in models}
        if h5:
            ix0 = jnp.zeros_like(em[models[0]])
            ix1 = jnp.zeros_like(em[models[0]])
            pins = consts["hmm5"]["pins"]          # (21, 2) np
        for c in range(20):                        # PAD(20) emits zero
            mask = xrow == c
            for mi, m in enumerate(models):
                em[m] = jnp.where(mask, colt_refs[mi][c], em[m])
            if h5:
                ix0 = jnp.where(mask, pins[c, 0], ix0)
                ix1 = jnp.where(mask, pins[c, 1], ix1)

        if h5:
            t = consts["hmm5"]
            T5, init5 = t["T"], t["init"]
            iy0, iy1 = t["iy0"], t["iy1"]          # traced (Bb, Wp)
            o = soffs["hmm5"]
            k0 = koffs["hmm5"]
            m1, x11, y11, x21, y21 = (st_ref[o + i] for i in range(5))
            m2, x12, y12, x22, y22 = (st_ref[o + 5 + i] for i in range(5))
            s1 = sc_ref[k0 + 0][:, 0:1]
            rc = sc_ref[k0 + 2][:, 0:1]
            e2s1 = _pow2i(s1)

            # injections select (never multiply) e2s1: it overflows to
            # inf long after the terminal diagonal (ops/wavefront.py)
            inj_m_mask = (d == ox + oy + 2) & (lane == oy + 1)
            am = (
                shift1(m2) * T5[0, 0]
                + shift1(x12) * T5[1, 0]
                + shift1(y12) * T5[2, 0]
                + shift1(x22) * T5[3, 0]
                + shift1(y22) * T5[4, 0]
            ) * rc + jnp.where(inj_m_mask, init5[0] * e2s1, 0.0)
            m_new = em["hmm5"] * am
            injx = (d == ox + oy + 1) & (lane == oy)
            injy = (d == ox + oy + 1) & (lane == oy + 1)
            x1_new = ix0 * (
                m1 * T5[0, 1] + x11 * T5[1, 1]
                + jnp.where(injx, init5[1] * e2s1, 0.0)
            )
            x2_new = ix1 * (
                m1 * T5[0, 3] + x21 * T5[3, 3]
                + jnp.where(injx, init5[3] * e2s1, 0.0)
            )
            y1_new = iy0 * (
                shift1(m1) * T5[0, 2] + shift1(y11) * T5[2, 2]
                + jnp.where(injy, init5[2] * e2s1, 0.0)
            )
            y2_new = iy1 * (
                shift1(m1) * T5[0, 4] + shift1(y21) * T5[4, 4]
                + jnp.where(injy, init5[4] * e2s1, 0.0)
            )
            states = (m_new, x1_new, y1_new, x2_new, y2_new)
            mx = functools.reduce(jnp.maximum, states)
            mx = jnp.max(mx, axis=1, keepdims=True)
            e = _floor_log2(mx)
            f = _pow2i(-e)
            states = tuple(v * f for v in states)
            s_new = s1 - e
            for i in range(5):
                st_ref[o + 5 + i] = st_ref[o + i]
                st_ref[o + i] = states[i]
                cap = jnp.sum(states[i] * term_sel, axis=1, keepdims=True)
                old = sc_ref[k0 + 5 + i][:, 0:1]
                sc_ref[k0 + 5 + i] = jnp.broadcast_to(
                    old * (1.0 - at_term) + at_term * cap,
                    sc_ref[k0 + 5 + i].shape,
                )
            sc_ref[k0 + 1] = jnp.broadcast_to(s1, sc_ref[k0 + 1].shape)
            sc_ref[k0 + 0] = jnp.broadcast_to(s_new, sc_ref[k0 + 0].shape)
            sc_ref[k0 + 2] = jnp.broadcast_to(f, sc_ref[k0 + 2].shape)
            old_st = sc_ref[k0 + 3][:, 0:1]
            sc_ref[k0 + 3] = jnp.broadcast_to(
                old_st * (1.0 - at_term) + at_term * s_new,
                sc_ref[k0 + 3].shape,
            )
            emit = (am * f) if emit_pre else states[0]
            mi = list(models).index("hmm5")
            keep = (d < dmax).astype(jnp.float32)
            row = jnp.where(
                lane == lp + SCALE_LANE_OFF,
                s_new * keep, emit * keep,
            )
            plane_refs[mi][k] = row

        if "local" in models:
            t = consts["local"]
            TL, c1, c2 = t["T"], t["c1"], t["c2"]
            o = soffs["local"]
            k0 = koffs["local"]
            lm1, lxs1, lys1 = (st_ref[o + i] for i in range(3))
            lm2, lxs2, lys2 = (st_ref[o + 3 + i] for i in range(3))
            s1 = sc_ref[k0 + 0][:, 0:1]
            rc = sc_ref[k0 + 2][:, 0:1]
            e2s1 = _pow2i(s1)
            irow = d - lane
            inb = (
                (irow > ox) & (irow <= ox + lx)
                & (lane > oy) & (lane <= oy + ly)
            )
            am = (
                shift1(lm2) * TL[0, 0]
                + shift1(lxs2) * TL[1, 0]
                + shift1(lys2) * TL[2, 0]
            ) * rc + jnp.where(inb, e2s1, 0.0)
            m_new = em["local"] * c2 * am
            x_new = c1 * (lm1 * TL[0, 1] + lxs1 * TL[1, 1])
            lane_valid = (lane <= lp).astype(jnp.float32)
            y_new = c1 * (
                shift1(lm1) * TL[0, 2] + shift1(lys1) * TL[2, 2]
            ) * lane_valid
            states = (m_new, x_new, y_new)
            mx = jnp.max(
                jnp.maximum(jnp.maximum(m_new, x_new), y_new),
                axis=1, keepdims=True,
            )
            e = _floor_log2(mx)
            f = _pow2i(-e)
            states = tuple(v * f for v in states)
            s_new = s1 - e
            rowsum = jnp.sum(states[0], axis=1, keepdims=True)
            term = jnp.where(
                rowsum > 0,
                jnp.log2(jnp.maximum(rowsum, TINY)) - s_new,
                -jnp.inf,
            )
            acc = sc_ref[k0 + 4][:, 0:1]
            acc = jnp.logaddexp2(acc, term)
            sc_ref[k0 + 4] = jnp.broadcast_to(acc, sc_ref[k0 + 4].shape)
            for i in range(3):
                st_ref[o + 3 + i] = st_ref[o + i]
                st_ref[o + i] = states[i]
            sc_ref[k0 + 1] = jnp.broadcast_to(s1, sc_ref[k0 + 1].shape)
            sc_ref[k0 + 0] = jnp.broadcast_to(s_new, sc_ref[k0 + 0].shape)
            sc_ref[k0 + 2] = jnp.broadcast_to(f, sc_ref[k0 + 2].shape)
            emit = (am * f) if emit_pre else states[0]
            mi = list(models).index("local")
            keep = (d < dmax).astype(jnp.float32)
            row = jnp.where(
                lane == lp + SCALE_LANE_OFF,
                s_new * keep, emit * keep,
            )
            plane_refs[mi][k] = row

        if "partition" in models:
            t = consts["partition"]
            go, ge = t["go"], t["ge"]
            o = soffs["partition"]
            k0 = koffs["partition"]
            zm1, ze1, zf1 = (st_ref[o + i] for i in range(3))
            zm2, ze2, zf2 = (st_ref[o + 3 + i] for i in range(3))
            s1 = sc_ref[k0 + 0][:, 0:1]
            rc = sc_ref[k0 + 2][:, 0:1]
            e2s1 = _pow2i(s1)
            irow = d - lane
            row0 = irow == ox
            col0 = lane == oy
            x_done = irow == ox + lx
            inb = (
                (irow >= ox) & (irow <= ox + lx)
                & (lane >= oy) & (lane <= oy + ly)
            )
            am = shift1(zm2 + ze2 + zf2) * rc
            zm_new = em["partition"] * am
            zm_new = jnp.where(row0 & col0 & inb, e2s1, zm_new)
            gof = jnp.where(col0 | lane_end, 1.0, go)
            gef = jnp.where(col0 | lane_end, 1.0, ge)
            zf_new = zm1 * gof + zf1 * gef
            zf_new = jnp.where(col0 & (irow > ox), e2s1, zf_new)
            goe = jnp.where(x_done, 1.0, go)
            gee = jnp.where(x_done, 1.0, ge)
            ze_new = shift1(zm1) * goe + shift1(ze1) * gee
            ze_new = jnp.where(row0 & (lane > oy), e2s1, ze_new)
            zm_new = jnp.where(inb, zm_new, 0.0)
            zf_new = jnp.where(inb, zf_new, 0.0)
            ze_new = jnp.where(inb, ze_new, 0.0)
            am = jnp.where(inb, am, 0.0)
            states = (zm_new, ze_new, zf_new)
            mx = jnp.max(
                jnp.maximum(jnp.maximum(zm_new, ze_new), zf_new),
                axis=1, keepdims=True,
            )
            e = _floor_log2(mx)
            f = _pow2i(-e)
            states = tuple(v * f for v in states)
            s_new = s1 - e
            for i in range(3):
                st_ref[o + 3 + i] = st_ref[o + i]
                st_ref[o + i] = states[i]
                cap = jnp.sum(states[i] * term_sel, axis=1, keepdims=True)
                old = sc_ref[k0 + 5 + i][:, 0:1]
                sc_ref[k0 + 5 + i] = jnp.broadcast_to(
                    old * (1.0 - at_term) + at_term * cap,
                    sc_ref[k0 + 5 + i].shape,
                )
            sc_ref[k0 + 1] = jnp.broadcast_to(s1, sc_ref[k0 + 1].shape)
            sc_ref[k0 + 0] = jnp.broadcast_to(s_new, sc_ref[k0 + 0].shape)
            sc_ref[k0 + 2] = jnp.broadcast_to(f, sc_ref[k0 + 2].shape)
            old_st = sc_ref[k0 + 3][:, 0:1]
            sc_ref[k0 + 3] = jnp.broadcast_to(
                old_st * (1.0 - at_term) + at_term * s_new,
                sc_ref[k0 + 3].shape,
            )
            emit = (am * f) if emit_pre else states[0]
            mi = list(models).index("partition")
            keep = (d < dmax).astype(jnp.float32)
            row = jnp.where(
                lane == lp + SCALE_LANE_OFF,
                s_new * keep, emit * keep,
            )
            plane_refs[mi][k] = row

    # log2 totals (written every grid step; the last write wins)
    for mi, m in enumerate(models):
        k0 = koffs[m]
        if m == "hmm5":
            init5 = consts["hmm5"]["init"]
            tot = sum(
                sc_ref[k0 + 5 + i][:, 0:1] * float(init5[i])
                for i in range(5)
            )
            l2t = (
                jnp.log2(jnp.maximum(tot, TINY)) - sc_ref[k0 + 3][:, 0:1]
            )
        elif m == "local":
            l2t = sc_ref[k0 + 4][:, 0:1]
        else:
            tot = (
                sc_ref[k0 + 5][:, 0:1] + sc_ref[k0 + 6][:, 0:1]
                + sc_ref[k0 + 7][:, 0:1]
            )
            l2t = (
                jnp.log2(jnp.maximum(tot, TINY)) - sc_ref[k0 + 3][:, 0:1]
            )
        l2t_refs[mi][...] = jnp.broadcast_to(l2t, l2t_refs[mi].shape)


def _tup(a):
    a = np.asarray(a, np.float64)
    if a.ndim == 0:
        return float(a)
    return tuple(_tup(x) for x in a)


def freeze_consts(tables, models) -> tuple:
    """Hashable snapshot of the small parameter tables — baked into the
    kernel as compile-time constants (call OUTSIDE jit)."""
    out = []
    for m in models:
        t = tables[m]
        if m == "hmm5":
            out.append((m, (_tup(t["T"]), _tup(t["init"]),
                            _tup(t["pins"]))))
        elif m == "local":
            out.append((m, (_tup(t["T"]), _tup(t["c1"]), _tup(t["c2"]))))
        else:
            out.append((m, (_tup(t["go"]), _tup(t["ge"]))))
    return tuple(out)


def _np_consts(frozen):
    out = {}
    for m, payload in frozen:
        if m == "hmm5":
            T, init, pins = payload
            out[m] = {
                "T": np.asarray(T, np.float32),
                "init": np.asarray(init, np.float32),
                "pins": np.asarray(pins, np.float32),
            }
        elif m == "local":
            T, c1, c2 = payload
            out[m] = {
                "T": np.asarray(T, np.float32),
                "c1": float(c1), "c2": float(c2),
            }
        else:
            go, ge = payload
            out[m] = {"go": float(go), "ge": float(ge)}
    return out


def sweep(
    xp, yp, ox, oy, lx, ly, tables,
    models: tuple[str, ...],
    lp: int,
    emit_pre: bool = False,
    interpret: bool = False,
):
    """One full wavefront pass.  Returns (planes, l2t) dicts.

    planes[m]: (Dp, B, Wp) f32 with the per-diagonal scale S stored in
    lane lp + SCALE_LANE_OFF of every row; l2t[m]: (B,) f32.
    """
    frozen = freeze_consts(tables, models)
    pms = tuple(tables[m]["pm"] for m in models)
    return _sweep_jit(
        xp, yp, ox, oy, lx, ly, pms, frozen,
        models=models, lp=lp, emit_pre=emit_pre, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("frozen", "models", "lp", "emit_pre", "interpret"),
)
def _sweep_jit(
    xp, yp, ox, oy, lx, ly, pms, frozen,
    models: tuple[str, ...],
    lp: int,
    emit_pre: bool = False,
    interpret: bool = False,
):
    b = xp.shape[0]
    # long pairs arrive in batches smaller than the block size (the
    # HBM-budgeted batch honours B=1; PosteriorTasksWave long class)
    bb = min(_block_pairs(lp), b)
    assert b % bb == 0, (b, bb)
    wp, dp = _wpad(lp), _dpad(lp)
    consts = _np_consts(frozen)

    xlpad = ((3 * lp + 2 + 127) // 128 + 1) * 128
    padb = jnp.full((b, lp + 1), PAD, xp.dtype)
    xfeed = jnp.concatenate(
        [padb, xp[:, ::-1], padb,
         jnp.full((b, xlpad - (3 * lp + 2)), PAD, xp.dtype)], axis=1
    )                                             # (B, XLpad) int8
    colts = [lane_tables(yp, pms[i], lp) for i in range(len(models))]
    meta = pair_meta(ox, oy, lx, ly)
    if "hmm5" in models:
        # iy[b, j, i] = pins[y_j, i]: traced rows handed to the kernel
        # as two (B, Wp) inputs
        pins = jnp.asarray(consts["hmm5"]["pins"])
        ygrid = jnp.concatenate(
            [jnp.full((b, 1), PAD, yp.dtype), yp,
             jnp.full((b, wp - lp - 1), PAD, yp.dtype)], axis=1
        ).astype(jnp.int32)
        iy0 = pins[ygrid, 0]
        iy1 = pins[ygrid, 1]
    else:
        iy0 = jnp.zeros((b, wp), jnp.float32)
        iy1 = jnp.zeros((b, wp), jnp.float32)

    nstate2 = sum(2 * _NSTATE[m] for m in models)
    nscal = sum(_NSCAL[m] for m in models)

    def kernel(xsk_ref, meta_ref, iy0_ref, iy1_ref, *rest):
        colt_hbm = rest[: len(models)]
        plane_refs = rest[len(models): 2 * len(models)]
        l2t_refs = rest[2 * len(models): 3 * len(models)]
        (st_ref, sc_ref, xr_ref,
         colt_scr, colt_sem) = rest[3 * len(models):]
        colt_refs = [colt_scr.at[mi] for mi in range(len(models))]
        c = dict(consts)
        if "hmm5" in models:
            c["hmm5"] = dict(c["hmm5"])
            c["hmm5"]["iy0"] = iy0_ref[...]
            c["hmm5"]["iy1"] = iy1_ref[...]
        _sweep_kernel_body(
            models, lp, emit_pre, c,
            xsk_ref, colt_refs, meta_ref,
            plane_refs, l2t_refs, st_ref, sc_ref, xr_ref,
            colt_hbm, colt_scr, colt_sem,
        )

    grid = (b // bb, dp // CH)
    in_specs = [
        pl.BlockSpec((bb, xlpad), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),        # xfeed
        pl.BlockSpec((bb, 128), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),        # meta
        pl.BlockSpec((bb, wp), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),        # iy0
        pl.BlockSpec((bb, wp), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),        # iy1
    ] + [
        # colt tables stay in HBM; the kernel DMAs each pair block's
        # slice into persistent scratch once (at dc == 0) instead of
        # re-fetching (and double-buffering) it every grid step
        pl.BlockSpec(memory_space=pltpu.ANY)
        for _ in models
    ]
    out_specs = tuple(
        [pl.BlockSpec((CH, bb, wp), lambda i, j: (j, i, 0),
                      memory_space=pltpu.VMEM) for _ in models]
        + [pl.BlockSpec((bb, 128), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM) for _ in models]
    )
    out_shape = tuple(
        [jax.ShapeDtypeStruct((dp, b, wp), jnp.float32) for _ in models]
        + [jax.ShapeDtypeStruct((b, 128), jnp.float32) for _ in models]
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nstate2, bb, wp), jnp.float32),
            pltpu.VMEM((nscal, bb, 128), jnp.float32),
            pltpu.VMEM((bb, wp), jnp.int32),
            pltpu.VMEM((len(models), 21, bb, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((len(models),)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # CH=16 double-buffered plane blocks need ~17-29 MiB of
            # scoped VMEM; the 16 MiB default rejects the kernel on the
            # AOT compile path (v5e VMEM is 128 MiB)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xfeed, meta, iy0, iy1, *colts)
    planes = {m: outs[i] for i, m in enumerate(models)}
    l2t = {m: outs[len(models) + i][:, 0] for i, m in enumerate(models)}
    return planes, l2t


# ---------------------------------------------------------------------------
# Combine kernel: posterior + RMS + MWT
# ---------------------------------------------------------------------------


def _combine_kernel_body(
    models, lp, with_matches, topk, cutoff,
    meta_ref, l2t_refs, fwd_refs, rev_hbm_refs,
    post_ref, score_ref, nb_ref, vals_ref, lanes_ref,
    mwt_ref, rev_buf, sem,
):
    dc = pl.program_id(1)
    wp = _wpad(lp)
    nm = len(models)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    lxv = meta_ref[:, 2:3]
    lyv = meta_ref[:, 3:4]
    dterm = lxv + lyv
    term_sel = (lane == lyv).astype(jnp.float32)
    valid_lane = (lane <= lp).astype(jnp.float32)

    @pl.when(dc == 0)
    def _():
        mwt_ref[...] = jnp.zeros_like(mwt_ref)

    # rev rows for this chunk: natural rows 2*lp+2-d for
    # d in [dc*CH, dc*CH+CH), fetched ascending.  The window start is
    # clamped at 0 (the last valid chunk straddles the plane top), so
    # the per-step in-buffer index is r(k) - start, not simply CH-1-k.
    ib = pl.program_id(0)
    bb = rev_buf.shape[2]
    d0 = dc * CH
    dp_rows = rev_hbm_refs[0].shape[0]
    r_base = 2 * lp + 3 - d0 - CH
    r_start = jnp.clip(r_base, 0, dp_rows - CH)

    def rev_dma(mi):
        return pltpu.make_async_copy(
            rev_hbm_refs[mi].at[
                pl.ds(r_start, CH), pl.ds(ib * bb, bb), :
            ],
            rev_buf.at[mi],
            sem.at[mi],
        )

    for mi in range(nm):
        rev_dma(mi).start()
    for mi in range(nm):
        rev_dma(mi).wait()

    # out[j] = flipped[j + wp - lp - 2] = roll(flipped, lp + 2 - wp)[j];
    # roll is circular, so the equivalent non-negative shift is lp + 2.
    roll_amt = lp + 2

    lane0 = lane == 0

    def shift1(v):
        r = pltpu.roll(v, shift=1, axis=1)
        return jnp.where(lane0, 0.0, r)

    for k in range(CH):
        d = d0 + k
        # ---- per-model posterior ---------------------------------------
        acc = None
        for mi, m in enumerate(models):
            frow = fwd_refs[mi][k]
            sf = frow[:, lp + SCALE_LANE_OFF: lp + SCALE_LANE_OFF + 1]
            ridx = jnp.clip(2 * lp + 2 - d0 - k - r_start, 0, CH - 1)
            rraw = rev_buf[mi, pl.ds(ridx, 1)][0]
            # planes arrive lane-flipped (lane q = raw lane wp-1-q, done
            # in XLA: the TPU pallas lowering has no lane-reverse), so
            # the scale sits at wp-1-(lp+SCALE_LANE_OFF) and the value
            # remap out[j] = raw[lp+1-j] is a single circular roll
            sq = wp - 1 - (lp + SCALE_LANE_OFF)
            sr = rraw[:, sq: sq + 1]
            rrow = pltpu.roll(rraw, shift=roll_amt, axis=1)
            l2t = l2t_refs[mi][:, 0:1]
            # p = f * r * 2^-(sf+sr+l2t), computed as an exact
            # power-of-two split multiply: (f*2^a)*(r*2^b)*2^-tf with
            # a+b = -floor(t).  Splitting before the product keeps
            # tiny*huge cells out of f32 under/overflow, and the only
            # inexact factor is one scalar exp2 per pair row.
            t = sf + sr + l2t
            ti = jnp.floor(t)
            a = jnp.floor(-ti * 0.5)
            b2 = -ti - a
            c = jnp.exp2(-(t - ti))
            p = (frow * _pow2i(a)) * (rrow * _pow2i(b2)) * c
            p = jnp.minimum(p, 1.0)
            p = jnp.where((frow > 0) & (rrow > 0), p, 0.0)
            p = p * valid_lane
            acc = p * p if acc is None else acc + p * p
        if nm == 1:
            prow = jnp.sqrt(acc)
        else:
            prow = jnp.sqrt(acc / nm)
        if topk:
            # fused per-diagonal top-k (Finalization.cl + SparseMatrix.cl
            # role): k iterative masked-max extractions keep the big
            # posterior plane out of HBM entirely on the sparse path
            rem = jnp.where(prow >= cutoff, prow, 0.0)
            vrow = jnp.zeros_like(prow[:, :128])
            lrow = jnp.zeros((prow.shape[0], 128), jnp.int32)
            lane128 = jax.lax.broadcasted_iota(
                jnp.int32, (1, 128), 1
            )
            for t in range(topk):
                v = jnp.max(rem, axis=1, keepdims=True)
                hit = (rem == v) & (v > 0)
                # lowest lane among ties (top_k tie order)
                lidx = jnp.min(
                    jnp.where(hit, lane, wp), axis=1, keepdims=True
                )
                rem = jnp.where(lane == lidx, 0.0, rem)
                sel = lane128 == t
                vrow = jnp.where(sel, v, vrow)
                lrow = jnp.where(
                    sel, jnp.where(v > 0, lidx, 0), lrow
                )
            vals_ref[k] = vrow
            lanes_ref[k] = lrow
        else:
            post_ref[k] = prow

        # ---- MWT carry --------------------------------------------------
        s1, s2 = mwt_ref[0], mwt_ref[1]
        irow = d - lane
        pd = prow + shift1(s2)
        left = shift1(s1)
        up = s1
        take_d = (pd >= left) & (pd >= up)
        take_l = left >= up
        s_new = jnp.where(take_d, pd, jnp.where(take_l, left, up))
        boundary = (irow <= 0) | (lane == 0)
        s_new = jnp.where(boundary, 0.0, s_new)
        at_term = (d == dterm).astype(jnp.float32)
        cap = jnp.sum(s_new * term_sel, axis=1, keepdims=True)
        old = mwt_ref[4][:, 0:1]
        mwt_ref[4] = jnp.broadcast_to(
            old * (1.0 - at_term) + at_term * cap, mwt_ref[4].shape
        )
        if with_matches:
            n1, n2 = mwt_ref[2], mwt_ref[3]
            nd = shift1(n2) + 1.0
            nl = shift1(n1)
            n_new = jnp.where(take_d, nd, jnp.where(take_l, nl, n1))
            n_new = jnp.where(boundary, 0.0, n_new)
            capn = jnp.sum(n_new * term_sel, axis=1, keepdims=True)
            oldn = mwt_ref[5][:, 0:1]
            mwt_ref[5] = jnp.broadcast_to(
                oldn * (1.0 - at_term) + at_term * capn, mwt_ref[5].shape
            )
            mwt_ref[3] = n1
            mwt_ref[2] = n_new
        mwt_ref[1] = s1
        mwt_ref[0] = s_new

    score_ref[...] = jnp.broadcast_to(
        mwt_ref[4][:, 0:1], score_ref.shape
    )
    if with_matches:
        nb_ref[...] = jnp.broadcast_to(
            mwt_ref[5][:, 0:1], nb_ref.shape
        )
    else:
        nb_ref[...] = jnp.zeros_like(nb_ref)


@functools.partial(
    jax.jit,
    static_argnames=(
        "models", "lp", "with_matches", "topk", "cutoff", "interpret"
    ),
)
def combine(
    fwd_planes, fwd_l2t, rev_planes, rev_l2t, lx, ly,
    models: tuple[str, ...],
    lp: int,
    with_matches: bool = False,
    topk: int = 0,
    cutoff: float = 0.01,
    interpret: bool = False,
):
    """Posterior combine + MWT over sweep outputs.

    topk == 0: returns (post (Dp, B, Wp) f32, score (B,), nb).
    topk > 0: the posterior plane never leaves VMEM; returns
    (vals (Dp, B, topk) f32, lanes (Dp, B, topk) int32, score, nb) —
    the per-diagonal top-k extraction fused into the kernel
    (Finalization.cl + SparseMatrix.cl roles).
    Totals: hmm5/local average the fwd and rev log2-totals; partition
    uses the forward total (ops/wavefront.posterior_skew semantics).
    """
    b = lx.shape[0]
    bb = min(_block_pairs(lp), b)
    wp, dp = _wpad(lp), _dpad(lp)
    nm = len(models)
    meta = pair_meta(jnp.zeros_like(lx), jnp.zeros_like(ly), lx, ly)
    l2ts = []
    for m in models:
        if m == "partition":
            l2ts.append(jnp.broadcast_to(
                fwd_l2t[m][:, None], (b, 128)).astype(jnp.float32))
        else:
            l2ts.append(jnp.broadcast_to(
                (0.5 * (fwd_l2t[m] + rev_l2t[m]))[:, None], (b, 128)
            ).astype(jnp.float32))

    def kernel(*refs):
        meta_ref = refs[0]
        l2t_refs = refs[1: 1 + nm]
        fwd_refs = refs[1 + nm: 1 + 2 * nm]
        rev_refs = refs[1 + 2 * nm: 1 + 3 * nm]
        outs = refs[1 + 3 * nm: 1 + 3 * nm + 4]
        if topk:
            vals_ref, lanes_ref, score_ref, nb_ref = outs
            post_ref = None
        else:
            post_ref, score_ref, nb_ref = outs[:3]
            vals_ref = lanes_ref = None
        mwt_ref, rev_buf, sem = refs[1 + 3 * nm + (4 if topk else 3):]
        _combine_kernel_body(
            models, lp, with_matches, topk, cutoff,
            meta_ref, l2t_refs, fwd_refs, rev_refs,
            post_ref, score_ref, nb_ref, vals_ref, lanes_ref,
            mwt_ref, rev_buf, sem,
        )

    grid = (b // bb, dp // CH)
    in_specs = (
        [pl.BlockSpec((bb, 128), lambda i, j: (i, 0),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((bb, 128), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM) for _ in models]
        + [pl.BlockSpec((CH, bb, wp), lambda i, j: (j, i, 0),
                        memory_space=pltpu.VMEM) for _ in models]
        # rev planes: full arrays stay in HBM, DMA'd manually with the
        # reversed-row remap
        + [pl.BlockSpec(memory_space=pltpu.ANY) for _ in models]
    )
    scalar_spec = pl.BlockSpec((bb, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
    if topk:
        out_specs = (
            pl.BlockSpec((CH, bb, 128), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, bb, 128), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            scalar_spec, scalar_spec,
        )
        out_shape = (
            jax.ShapeDtypeStruct((dp, b, 128), jnp.float32),
            jax.ShapeDtypeStruct((dp, b, 128), jnp.int32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
        )
    else:
        out_specs = (
            pl.BlockSpec((CH, bb, wp), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            scalar_spec, scalar_spec,
        )
        out_shape = (
            jax.ShapeDtypeStruct((dp, b, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
        )
    nmwt = 6
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((nmwt, bb, wp), jnp.float32),
            pltpu.VMEM((nm, CH, bb, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((nm,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # CH=16 double-buffered plane blocks need ~17-29 MiB of
            # scoped VMEM; the 16 MiB default rejects the kernel on the
            # AOT compile path (v5e VMEM is 128 MiB)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta, *l2ts, *[fwd_planes[m] for m in models],
      *[rev_planes[m][:, :, ::-1] for m in models])
    if topk:
        vals, lanes, score, nb = outs
        res = (vals[:, :, :topk], lanes[:, :, :topk], score[:, 0])
        return res + ((nb[:, 0],) if with_matches else ())
    post, score, nb = outs
    if with_matches:
        return post, score[:, 0], nb[:, 0]
    return post, score[:, 0]


# ---------------------------------------------------------------------------
# Full pipeline wrapper
# ---------------------------------------------------------------------------


def posterior_pallas(
    X, Y, LX, LY, tabs_f, tabs_r,
    models: tuple[str, ...],
    with_matches: bool = False,
    topk: int = 0,
    cutoff: float = 0.01,
    interpret: bool = False,
):
    """Fused-kernel replacement for the scan engine's posterior stage.

    topk == 0: returns (post_skew (Dp, B, Wp), score (B,)[, nb (B,)]) —
    the skewed combined posterior plane (zero beyond the true D/W
    extents) plus the MWT accuracy scores, the same contract as
    composing wavefront.wavefront_forward + posterior_skew + mwt_skew.
    topk > 0: returns (vals (Dp, B, topk), lanes, score[, nb]) with the
    sparsification fused into the combine kernel (the posterior plane
    never reaches HBM).
    """
    b, lp = X.shape
    zero = jnp.zeros((b,), jnp.int32)
    rev_planes, rev_l2t = sweep(
        X[:, ::-1], Y[:, ::-1], lp - LX, lp - LY, LX, LY, tabs_r,
        models=models, lp=lp, emit_pre=True, interpret=interpret,
    )
    fwd_planes, fwd_l2t = sweep(
        X, Y, zero, zero, LX, LY, tabs_f,
        models=models, lp=lp, emit_pre=False, interpret=interpret,
    )
    return combine(
        fwd_planes, fwd_l2t, rev_planes, rev_l2t, LX, LY,
        models=models, lp=lp, with_matches=with_matches,
        topk=topk, cutoff=cutoff, interpret=interpret,
    )
