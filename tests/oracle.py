"""Slow, literal numpy oracles for the reference dynamic programs.

These follow the reference recurrences cell by cell (ProbabilisticModel.h,
MSAPartProbs.cpp) and exist purely to validate the vectorised row-scan
implementations in mlprobs_tpu.ops on small inputs.
"""
from __future__ import annotations

import numpy as np

NEG = -1e30


def lse(*xs):
    m = np.maximum.reduce(xs)
    if m <= NEG / 2:
        return NEG
    return m + np.log(sum(np.exp(x - m) for x in xs))


def hmm5_posterior_oracle(x, y, p):
    """5-state model posterior, (lx, ly) plane (0-based)."""
    lx, ly = len(x), len(y)
    t, init = p["trans"], p["init"]
    lm, li = p["lmatch"], p["lins"]
    S = 5
    f = np.full((S, lx + 1, ly + 1), NEG)
    # init cells
    f[0, 1, 1] = init[0] + lm[x[0], y[0]]
    for k in range(2):
        f[2 * k + 1, 1, 0] = init[2 * k + 1] + li[x[0], k]
        f[2 * k + 2, 0, 1] = init[2 * k + 2] + li[y[0], k]
    for i in range(lx + 1):
        for j in range(ly + 1):
            if i > 1 or j > 1:
                if i > 0 and j > 0:
                    v = f[0, i - 1, j - 1] + t[0, 0]
                    for k in range(1, S):
                        v = lse(v, f[k, i - 1, j - 1] + t[k, 0])
                    f[0, i, j] = v + lm[x[i - 1], y[j - 1]]
                if i > 0:
                    for k in range(2):
                        f[2 * k + 1, i, j] = li[x[i - 1], k] + lse(
                            f[0, i - 1, j] + t[0, 2 * k + 1],
                            f[2 * k + 1, i - 1, j] + t[2 * k + 1, 2 * k + 1],
                        )
                if j > 0:
                    for k in range(2):
                        f[2 * k + 2, i, j] = li[y[j - 1], k] + lse(
                            f[0, i, j - 1] + t[0, 2 * k + 2],
                            f[2 * k + 2, i, j - 1] + t[2 * k + 2, 2 * k + 2],
                        )
    b = np.full((S, lx + 1, ly + 1), NEG)
    for k in range(S):
        b[k, lx, ly] = init[k]
    for i in range(lx, -1, -1):
        for j in range(ly, -1, -1):
            if i < lx and j < ly:
                pxy = b[0, i + 1, j + 1] + lm[x[i], y[j]]
                for k in range(S):
                    b[k, i, j] = lse(b[k, i, j], pxy + t[k, 0])
            if i < lx:
                for k in range(2):
                    s = 2 * k + 1
                    b[0, i, j] = lse(
                        b[0, i, j], b[s, i + 1, j] + li[x[i], k] + t[0, s]
                    )
                    b[s, i, j] = lse(
                        b[s, i, j], b[s, i + 1, j] + li[x[i], k] + t[s, s]
                    )
            if j < ly:
                for k in range(2):
                    s = 2 * k + 2
                    b[0, i, j] = lse(
                        b[0, i, j], b[s, i, j + 1] + li[y[j], k] + t[0, s]
                    )
                    b[s, i, j] = lse(
                        b[s, i, j], b[s, i, j + 1] + li[y[j], k] + t[s, s]
                    )
    total_f = NEG
    for k in range(S):
        total_f = lse(total_f, f[k, lx, ly] + init[k])
    total_b = f[0, 1, 1] + b[0, 1, 1]
    for k in range(2):
        total_b = lse(total_b, f[2 * k + 1, 1, 0] + b[2 * k + 1, 1, 0])
        total_b = lse(total_b, f[2 * k + 2, 0, 1] + b[2 * k + 2, 0, 1])
    total = 0.5 * (total_f + total_b)
    post = np.exp(np.minimum(0.0, f[0] + b[0] - total))[1:, 1:]
    return post, total


def local_posterior_oracle(x, y, p):
    """3-state local model posterior, (lx, ly) plane."""
    lx, ly = len(x), len(y)
    lt, rt1 = p["trans"], p["log_stay"]
    lm, li = p["lmatch"], p["lins"]

    def mp(i, j):
        return lm[x[i - 1], y[j - 1]] - li[x[i - 1]] - li[y[j - 1]]

    f = np.full((3, lx + 1, ly + 1), NEG)
    for i in range(lx + 1):
        for j in range(ly + 1):
            if i == 1 and j == 1:
                f[0, i, j] = mp(i, j) - 2 * rt1
            if i > 1 or j > 1:
                if i > 0 and j > 0:
                    v = mp(i, j) - 2 * rt1
                    for k in range(3):
                        v = lse(
                            v,
                            mp(i, j) + f[k, i - 1, j - 1] + lt[k, 0]
                            - 2 * rt1,
                        )
                    f[0, i, j] = v
                if i > 0:
                    f[1, i, j] = lse(
                        f[0, i - 1, j] + lt[0, 1] - rt1,
                        f[1, i - 1, j] + lt[1, 1] - rt1,
                    )
                if j > 0:
                    f[2, i, j] = lse(
                        f[0, i, j - 1] + lt[0, 2] - rt1,
                        f[2, i, j - 1] + lt[2, 2] - rt1,
                    )
    b = np.full((3, lx + 1, ly + 1), NEG)
    for i in range(lx, -1, -1):
        for j in range(ly, -1, -1):
            b[0, i, j] = 0.0
            if i < lx and j < ly:
                pxy = b[0, i + 1, j + 1] + mp(i + 1, j + 1)
                for k in range(3):
                    b[k, i, j] = lse(
                        b[k, i, j], pxy + lt[k, 0] - 2 * rt1
                    )
            if i < lx:
                b[0, i, j] = lse(b[0, i, j],
                                 b[1, i + 1, j] + lt[0, 1] - rt1)
                b[1, i, j] = lse(b[1, i, j],
                                 b[1, i + 1, j] + lt[1, 1] - rt1)
            if j < ly:
                b[0, i, j] = lse(b[0, i, j],
                                 b[2, i, j + 1] + lt[0, 2] - rt1)
                b[2, i, j] = lse(b[2, i, j],
                                 b[2, i, j + 1] + lt[2, 2] - rt1)
    total_f, total_b = NEG, NEG
    for i in range(1, lx + 1):
        for j in range(1, ly + 1):
            total_f = lse(total_f, f[0, i, j])
            total_b = lse(total_b, b[0, i, j] + mp(i, j) - 2 * rt1)
    total = 0.5 * (total_f + total_b)
    post = np.exp(np.minimum(0.0, f[0] + b[0] - total))[1:, 1:]
    return post, total


def partition_posterior_oracle(x, y, p):
    """Probalign partition-function posterior in probability space.

    Follows MSAPartProbs.cpp partf/revers_partf with free terminal gaps.
    x indexes rows (seq1), y columns (seq2); returns (lx, ly) plane.
    """
    lx, ly = len(x), len(y)
    s = np.exp(np.asarray(p["lscore"], np.float64))
    d = np.exp(float(p["lgap_open"]))
    e = np.exp(float(p["lgap_ext"]))

    def run(xs, ys):
        n, m = len(xs), len(ys)
        zm = np.zeros((n + 1, m + 1), dtype=np.longdouble)
        ze = np.zeros((n + 1, m + 1), dtype=np.longdouble)
        zf = np.zeros((n + 1, m + 1), dtype=np.longdouble)
        zm[0, 0] = 1.0
        for i in range(1, n + 1):
            zf[i, 0] = 1.0  # free terminal gap column (termgap = 1)
        for j in range(1, m + 1):
            ze[0, j] = 1.0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                open0 = extend0 = open1 = extend1 = 1.0
                if i < n:
                    open0, extend0 = d, e
                if j < m:
                    open1, extend1 = d, e
                sc = s[xs[i - 1], ys[j - 1]]
                ze[i, j] = zm[i, j - 1] * open0 + ze[i, j - 1] * extend0
                zf[i, j] = zm[i - 1, j] * open1 + zf[i - 1, j] * extend1
                zm[i, j] = (
                    zm[i - 1, j - 1] + ze[i - 1, j - 1] + zf[i - 1, j - 1]
                ) * sc
        total = zm[n, m] + ze[n, m] + zf[n, m]
        return zm, total

    # note: reference maps i over seq2, j over seq1; equivalent by symmetry.
    zmf, total = run(x, y)
    zmr, total_r = run(x[::-1], y[::-1])
    post = np.zeros((lx, ly))
    for i in range(1, lx + 1):
        for j in range(1, ly + 1):
            sc = s[x[i - 1], y[j - 1]]
            post[i - 1, j - 1] = float(
                zmf[i, j] * zmr[lx - i + 1, ly - j + 1] / (sc * total)
            )
    return post, float(total)
