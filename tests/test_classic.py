"""SW/NW support aligners (ops/classic.py) vs brute-force loop DP."""
import numpy as np
import pytest

from mlprobs_tpu.ops import classic


def _brute_sw(x, y, subs, gi, ge):
    lx, ly = len(x), len(y)
    H = np.zeros((lx + 1, ly + 1), dtype=np.int64)
    E = np.zeros_like(H)
    F = np.zeros_like(H)
    best = 0
    for i in range(1, lx + 1):
        for j in range(1, ly + 1):
            E[i, j] = max(E[i, j - 1] + ge, H[i, j - 1] + gi)
            F[i, j] = max(F[i - 1, j] + ge, H[i - 1, j] + gi)
            H[i, j] = max(0, E[i, j], F[i, j],
                          H[i - 1, j - 1] + subs[x[i - 1], y[j - 1]])
            best = max(best, H[i, j])
    return int(best)


def _brute_nw(x, y, subs, gi, ge):
    lx, ly = len(x), len(y)
    NEG = -(2 ** 30)
    H = np.zeros((lx + 1, ly + 1), dtype=np.int64)
    E = np.full_like(H, NEG)
    F = np.full_like(H, NEG)
    for j in range(1, ly + 1):
        H[0, j] = E[0, j] = gi + (j - 1) * ge
    for i in range(1, lx + 1):
        H[i, 0] = F[i, 0] = gi + (i - 1) * ge
    for i in range(1, lx + 1):
        for j in range(1, ly + 1):
            E[i, j] = max(E[i, j - 1] + ge, H[i, j - 1] + gi)
            F[i, j] = max(F[i - 1, j] + ge, H[i - 1, j] + gi)
            H[i, j] = max(E[i, j], F[i, j],
                          H[i - 1, j - 1] + subs[x[i - 1], y[j - 1]])
    return int(H[lx, ly])


@pytest.fixture
def subs():
    from mlprobs_tpu.models import params as mp

    return np.asarray(mp.blosum62(), dtype=np.int64)


@pytest.mark.parametrize("seed", range(4))
def test_sw_matches_brute_force(seed, subs):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 20, rng.integers(5, 40))
    y = rng.integers(0, 20, rng.integers(5, 40))
    want = _brute_sw(x, y, subs, gi=-11, ge=-1)
    got, bi, bj = classic.smith_waterman(x, y, subs, gi=-11, ge=-1)
    assert got == want
    score2, path = classic.sw_align(x, y, subs, gi=-11, ge=-1)
    assert score2 == want
    # path consistency: rescoring the path reproduces the score
    s = 0
    prev = None
    for (i, j) in path:
        if i and j:
            s += subs[x[i - 1], y[j - 1]]
            in_gap = False
        else:
            if prev is not None and (bool(prev[0]) == bool(i)) and (
                prev[0] == 0 or prev[1] == 0
            ):
                s += -1
            else:
                s += -11
        prev = (i, j)
    assert s == want


@pytest.mark.parametrize("seed", range(4))
def test_nw_matches_brute_force(seed, subs):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 20, rng.integers(5, 40))
    y = rng.integers(0, 20, rng.integers(5, 40))
    want = _brute_nw(x, y, subs, gi=-11, ge=-1)
    got = classic.needleman_wunsch(x, y, subs, gi=-11, ge=-1)
    assert got == want


def test_nw_identical_sequences(subs):
    rng = np.random.default_rng(9)
    x = rng.integers(0, 20, 25)
    got = classic.needleman_wunsch(x, x, subs, gi=-11, ge=-1)
    assert got == int(subs[x, x].sum())
