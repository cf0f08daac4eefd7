"""Numeric validation of the row-scan DPs against literal oracles."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlprobs_tpu.models import params as mp
from mlprobs_tpu.ops import mwt, pairhmm, partition, viterbi
from mlprobs_tpu.ops.colscore import column_scores
from mlprobs_tpu.align import traceback as tb

from tests import oracle

RNG = np.random.default_rng(0)


def _p5():
    p = mp.hmm5_params()
    return {
        "trans": jnp.asarray(p.trans),
        "init": jnp.asarray(p.init),
        "lmatch": jnp.asarray(p.lmatch),
        "lins": jnp.asarray(p.lins),
    }


def _pl(leave=None):
    p = mp.hmm_local_params(leave)
    return {
        "trans": jnp.asarray(p.trans),
        "lmatch": jnp.asarray(p.lmatch),
        "lins": jnp.asarray(p.lins),
        "log_stay": jnp.asarray(p.log_stay),
    }


def _ppart():
    p = mp.partition_params()
    return {
        "lscore": jnp.asarray(p.lscore),
        "lgap_open": jnp.asarray(p.lgap_open),
        "lgap_ext": jnp.asarray(p.lgap_ext),
    }


def _np_params(p):
    return {k: np.asarray(v, np.float64) for k, v in p.items()}


def _rand_seq(n):
    return RNG.integers(0, 20, size=n).astype(np.int8)


@pytest.mark.parametrize("lx,ly,pad", [(7, 9, 0), (12, 5, 4), (1, 1, 3)])
def test_hmm5_posterior_matches_oracle(lx, ly, pad):
    p = _p5()
    x, y = _rand_seq(lx), _rand_seq(ly)
    xp = np.concatenate([x, np.full(pad, 20, np.int8)])
    yp = np.concatenate([y, np.full(pad, 20, np.int8)])
    got = np.asarray(
        pairhmm.hmm5_posterior(jnp.asarray(xp), jnp.asarray(yp), lx, ly, p)
    )
    want, _ = oracle.hmm5_posterior_oracle(x, y, _np_params(p))
    assert got.shape == (lx + pad, ly + pad)
    np.testing.assert_allclose(got[:lx, :ly], want, atol=2e-4)
    assert np.all(got[lx:, :] == 0) and np.all(got[:, ly:] == 0)


@pytest.mark.parametrize("lx,ly,pad", [(6, 8, 0), (10, 4, 5)])
def test_local_posterior_matches_oracle(lx, ly, pad):
    p = _pl(0.170705)
    x, y = _rand_seq(lx), _rand_seq(ly)
    xp = np.concatenate([x, np.full(pad, 20, np.int8)])
    yp = np.concatenate([y, np.full(pad, 20, np.int8)])
    got = np.asarray(
        pairhmm.local_posterior(jnp.asarray(xp), jnp.asarray(yp), lx, ly, p)
    )
    want, _ = oracle.local_posterior_oracle(x, y, _np_params(p))
    np.testing.assert_allclose(got[:lx, :ly], want, atol=2e-4)


@pytest.mark.parametrize("lx,ly,pad", [(6, 9, 0), (11, 7, 3), (2, 2, 2)])
def test_partition_posterior_matches_oracle(lx, ly, pad):
    p = _ppart()
    x, y = _rand_seq(lx), _rand_seq(ly)
    xp = np.concatenate([x, np.full(pad, 20, np.int8)])
    yp = np.concatenate([y, np.full(pad, 20, np.int8)])
    got = np.asarray(
        partition.partition_posterior(
            jnp.asarray(xp), jnp.asarray(yp), lx, ly, p
        )
    )
    want, _ = oracle.partition_posterior_oracle(x, y, _np_params(p))
    np.testing.assert_allclose(got[:lx, :ly], want, atol=2e-4)


def test_posterior_symmetry():
    """P(x_i ~ y_j) should equal its transpose when swapping inputs."""
    p = _p5()
    x, y = _rand_seq(9), _rand_seq(7)
    a = np.asarray(pairhmm.hmm5_posterior(jnp.asarray(x), jnp.asarray(y),
                                          9, 7, p))
    b = np.asarray(pairhmm.hmm5_posterior(jnp.asarray(y), jnp.asarray(x),
                                          7, 9, p))
    np.testing.assert_allclose(a, b.T, atol=2e-4)


def test_posterior_row_sums_bounded():
    p = _p5()
    x, y = _rand_seq(20), _rand_seq(25)
    post = np.asarray(
        pairhmm.hmm5_posterior(jnp.asarray(x), jnp.asarray(y), 20, 25, p)
    )
    assert post.min() >= 0
    assert post.sum(axis=1).max() <= 1.0 + 1e-3
    assert post.sum(axis=0).max() <= 1.0 + 1e-3


def _mwt_oracle(post):
    """Literal two-row DP + traceback (ComputeAlignment)."""
    lx, ly = post.shape
    s = np.zeros((lx + 1, ly + 1))
    d = np.zeros((lx + 1, ly + 1), dtype=np.int8)
    d[0, :] = 1
    d[1:, 0] = 2
    for i in range(1, lx + 1):
        for j in range(1, ly + 1):
            pd = post[i - 1, j - 1] + s[i - 1, j - 1]
            le, up = s[i, j - 1], s[i - 1, j]
            if pd >= le and pd >= up:
                s[i, j], d[i, j] = pd, 0
            elif le >= up:
                s[i, j], d[i, j] = le, 1
            else:
                s[i, j], d[i, j] = up, 2
    path = []
    r, c = lx, ly
    while r or c:
        dd = d[r, c]
        if dd == 0:
            r, c = r - 1, c - 1
            path.append(0)
        elif dd == 1:
            c -= 1
            path.append(2)
        else:
            r -= 1
            path.append(1)
    return s[lx, ly], np.array(path[::-1], dtype=np.int8)


def test_mwt_matches_oracle():
    for lx, ly in [(8, 11), (13, 6), (1, 1)]:
        post = RNG.random((lx, ly)).astype(np.float32) ** 4
        dirs, score = mwt.mwt_align(jnp.asarray(post), lx, ly)
        want_score, want_path = _mwt_oracle(post.astype(np.float64))
        got_path = tb.mwt_traceback(np.asarray(dirs), lx, ly)
        assert abs(float(score) - want_score) < 1e-4
        np.testing.assert_array_equal(got_path, want_path)


def _viterbi_oracle(x, y, p):
    lx, ly = len(x), len(y)
    lt, lm, li = p["trans"], p["lmatch"], p["lins"]
    NEG = -1e30
    v = np.full((3, lx + 1, ly + 1), NEG)
    t = np.full((3, lx + 1, ly + 1), -1, dtype=np.int64)
    vinit = np.asarray(viterbi.VIT_INIT, np.float64)
    v[:, 0, 0] = vinit
    for i in range(lx + 1):
        for j in range(ly + 1):
            if i > 0 and j > 0:
                for k in range(3):
                    nv = v[k, i - 1, j - 1] + lt[k, 0] + lm[x[i - 1], y[j - 1]]
                    if v[0, i, j] < nv:
                        v[0, i, j] = nv
                        t[0, i, j] = k
            if i > 0:
                a = li[x[i - 1]] + v[0, i - 1, j] + lt[0, 1]
                b = li[x[i - 1]] + v[1, i - 1, j] + lt[1, 1]
                v[1, i, j], t[1, i, j] = (a, 0) if a >= b else (b, 1)
            if j > 0:
                a = li[y[j - 1]] + v[0, i, j - 1] + lt[0, 2]
                b = li[y[j - 1]] + v[2, i, j - 1] + lt[2, 2]
                v[2, i, j], t[2, i, j] = (a, 0) if a >= b else (b, 2)
    best, state = NEG, -1
    for k in range(3):
        s = v[k, lx, ly] + vinit[k]
        if best < s:
            best, state = s, k
    path = []
    r, c = lx, ly
    while r or c:
        nxt = t[state, r, c]
        if state == 0:
            r, c = r - 1, c - 1
            path.append(0)
        elif state == 1:
            r -= 1
            path.append(1)
        else:
            c -= 1
            path.append(2)
        state = nxt
    return best, np.array(path[::-1], dtype=np.int8)


def test_viterbi_matches_oracle():
    p = _pl()
    pn = _np_params(p)
    for lx, ly in [(9, 7), (5, 14), (1, 1)]:
        x, y = _rand_seq(lx), _rand_seq(ly)
        dirs, end_state, score = viterbi.viterbi_local(
            jnp.asarray(x), jnp.asarray(y), lx, ly, p
        )
        want_score, want_path = _viterbi_oracle(x, y, pn)
        got_path = tb.viterbi_traceback(
            np.asarray(dirs), int(end_state), lx, ly
        )
        assert abs(float(score) - want_score) < 1e-3
        np.testing.assert_array_equal(got_path, want_path)


def test_column_scores_reference_semantics():
    # mirror the reference python loop on a small alignment
    from mlprobs_tpu.core.alphabet import encode
    from mlprobs_tpu.models.params import raw_params

    rows = np.stack([encode("AR-ND"), encode("ARCN-"), encode("AR-NX")])
    got = column_scores(rows)
    bl = raw_params()["blosum62"]
    order = "ARNDCQEGHILKMFPSTWYV"

    def s(a, b):
        if a not in order or b not in order:
            return 0.0
        return bl[order.index(a), order.index(b)]

    seqs = ["AR-ND", "ARCN-", "ARNX"]
    seqs = ["AR-ND", "ARCN-", "AR-NX"]
    want = []
    for col in range(5):
        tot = 0.0
        for i in range(3):
            for j in range(i + 1, 3):
                tot += s(seqs[i][col], seqs[j][col])
        want.append(tot / 3.0)
    np.testing.assert_allclose(got, want, atol=1e-9)
