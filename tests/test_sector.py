"""Sector-tiled device relaxation vs the scipy/native oracle."""
import numpy as np
import pytest
import scipy.sparse as sp

from mlprobs_tpu.align import consistency as cons
from mlprobs_tpu.align import sector


def _synthetic_posts(n=9, seed=0, max_len=40):
    rng = np.random.default_rng(seed)
    lengths = list(rng.integers(max_len // 2, max_len, n))
    posts = {}
    for i in range(n):
        for j in range(i + 1, n):
            li, lj = lengths[i], lengths[j]
            dense = np.zeros((li, lj), np.float32)
            # a noisy diagonal band, like a real posterior
            for r in range(li):
                c = int(r * lj / li)
                for dc in (-1, 0, 1):
                    if 0 <= c + dc < lj and rng.random() < 0.8:
                        dense[r, c + dc] = rng.uniform(0.01, 0.9)
            posts[(i, j)] = sp.csr_matrix(dense)
    return posts, lengths


def _compare(got, want, lengths, atol=2e-5):
    assert got.keys() == want.keys()
    for key in want:
        g = got[key].toarray()
        w = want[key].toarray()
        np.testing.assert_allclose(g, w, atol=atol, rtol=1e-4)


def test_sector_plain_matches_scipy():
    posts, lengths = _synthetic_posts()
    n = len(lengths)
    want = cons.relax_sparse(posts, lengths, reps=2)
    got = sector.relax_sector_device(posts, lengths, reps=2)
    _compare(got, want, lengths)


def test_sector_weighted_matches_scipy():
    posts, lengths = _synthetic_posts(seed=3)
    n = len(lengths)
    rng = np.random.default_rng(7)
    weights = rng.uniform(0.5, 2.0, n)
    want = cons.relax_sparse_weighted(
        posts, lengths, weights, reps=2, selfweight=3.0,
        selectivity=200.0, distances=None,
    )
    got = sector.relax_sector_device(
        posts, lengths, reps=2, weights=weights,
        selfweight=3.0, selectivity=200.0,
    )
    _compare(got, want, lengths)


def test_sector_multiple_blocks():
    """Force several sector blocks (tiny budget -> b < n)."""
    posts, lengths = _synthetic_posts(n=11, seed=5)
    rl = sector.SectorRelaxer(lengths, budget=11 * 128 * 128 * 8 * 3)
    assert rl.b < 11 and rl.nblocks >= 3
    n = len(lengths)
    sc, zs, w = cons.dense_relax_coeffs(n)
    got = rl.relax(posts, sc, zs, w, reps=1)
    want = cons.relax_sparse(posts, lengths, reps=1)
    _compare(got, want, lengths)
