"""EM re-estimation (ops/em.py) vs a brute-force path-enumeration
oracle (ProbabilisticModel::ComputeNewParameters semantics)."""
import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from mlprobs_tpu.align import pairwise
from mlprobs_tpu.ops import em, pairhmm


def _enumerate_paths(x, y, p):
    """All alignment paths of the 5-state HMM with their probabilities
    and per-transition/initial-state counts.  State moves: M consumes
    (1,1), X* (1,0), Y* (0,1).  A path starts at any state with
    init[s] * emit and ends anywhere at (Lx, Ly) weighted by init[s]
    (ComputeTotalProbability semantics)."""
    t = np.asarray(jnp.exp(p["trans"]))
    init = np.asarray(jnp.exp(p["init"]))
    pm = np.asarray(jnp.exp(p["lmatch"]))
    pins = np.asarray(jnp.exp(p["lins"]))
    Lx, Ly = len(x), len(y)
    moves = {0: (1, 1), 1: (1, 0), 2: (0, 1), 3: (1, 0), 4: (0, 1)}

    def emit(s, i, j):
        if s == 0:
            return pm[x[i - 1], y[j - 1]]
        if s in (1, 3):
            return pins[x[i - 1], 0 if s == 1 else 1]
        return pins[y[j - 1], 0 if s == 2 else 1]

    paths = []

    def rec(i, j, s, prob, trans_counts, init_state):
        if i == Lx and j == Ly:
            paths.append((prob * init[s], trans_counts, init_state, s))
            # a path may also continue past (Lx, Ly)? no — grid ends
        if i > Lx or j > Ly:
            return
        for ns in range(5):
            di, dj = moves[ns]
            ni, nj = i + di, j + dj
            if ni > Lx or nj > Ly:
                continue
            tc = dict(trans_counts)
            tc[(s, ns)] = tc.get((s, ns), 0) + 1
            rec(ni, nj, ns,
                prob * t[s, ns] * emit(ns, ni, nj), tc, init_state)

    for s in range(5):
        di, dj = moves[s]
        if di <= Lx and dj <= Ly:
            rec(di, dj, s, init[s] * emit(s, di, dj), {}, s)
    return paths


@pytest.mark.parametrize("seed,lx,ly", [(0, 3, 2), (1, 2, 3), (2, 3, 3)])
def test_em_counts_match_path_enumeration(seed, lx, ly):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 20, lx).astype(np.int8)
    y = rng.integers(0, 20, ly).astype(np.int8)
    p = pairwise.hmm5_dict()

    paths = _enumerate_paths(x, y, p)
    total = sum(pr for pr, _, _, _ in paths)
    exp_trans = np.zeros((5, 5))
    exp_init = np.zeros(5)
    for pr, tc, s0, _ in paths:
        for (a, b), c in tc.items():
            exp_trans[a, b] += pr * c
        exp_init[s0] += pr
    exp_trans /= total
    exp_init /= total
    # the reference counts the initial distribution as entry + terminal
    # posterior (sums to 2); terminal-state posterior:
    exp_term = np.zeros(5)
    for pr, _, _, sN in paths:
        exp_term[sN] += pr
    exp_term /= total
    init_counts = exp_init + exp_term

    got = em.hmm5_em_step(jnp.asarray(x), jnp.asarray(y), p)

    tot_init = init_counts.sum()
    want_init = np.empty(5)
    want_init[0] = init_counts[0] / tot_init
    for k in range(2):
        v = 0.5 * (init_counts[2 * k + 1] + init_counts[2 * k + 2])
        want_init[2 * k + 1] = want_init[2 * k + 2] = v / tot_init
    np.testing.assert_allclose(
        np.asarray(got["init"]), want_init, rtol=1e-4, atol=1e-6
    )

    in_match = exp_trans[0].sum()
    for k in range(2):
        go = (exp_trans[0, 2 * k + 1] + exp_trans[0, 2 * k + 2]) / (
            2 * in_match
        )
        in_gap = (
            exp_trans[2 * k + 1, 0] + exp_trans[2 * k + 1, 2 * k + 1]
            + exp_trans[2 * k + 2, 0] + exp_trans[2 * k + 2, 2 * k + 2]
        )
        ge = (exp_trans[2 * k + 1, 2 * k + 1]
              + exp_trans[2 * k + 2, 2 * k + 2]) / in_gap
        np.testing.assert_allclose(
            float(got["gap_open"][2 * k]), go, rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            float(got["gap_extend"][2 * k]), ge, rtol=1e-4, atol=1e-6
        )


def test_em_emission_counts_normalised():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 20, 6).astype(np.int8)
    y = rng.integers(0, 20, 5).astype(np.int8)
    p = pairwise.hmm5_dict()
    got = em.hmm5_em_step(
        jnp.asarray(x), jnp.asarray(y), p, train_emissions=True
    )
    pairs = np.asarray(got["emit_pairs"])
    single = np.asarray(got["emit_single"])
    assert pairs.shape == (21, 21) and single.shape == (21,)
    np.testing.assert_allclose(pairs, pairs.T, atol=1e-7)
    # upper-triangle-plus-diagonal normalisation
    tot = np.triu(pairs).sum()
    np.testing.assert_allclose(tot, 1.0, rtol=1e-4)
    np.testing.assert_allclose(single.sum(), 1.0, rtol=1e-4)
    assert (pairs >= 0).all() and (single >= 0).all()
