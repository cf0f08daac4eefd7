"""Fused Pallas wavefront kernels vs the lax.scan engine.

Runs the production TPU kernels (ops/pallas/wavefront_kernel) in
interpret mode on CPU and checks them against the scan engine
(ops/wavefront.py) they replace — same posterior planes, MWT scores,
match counts and sparse extraction, per model and in mix mode.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlprobs_tpu.align import pairwise
from mlprobs_tpu.ops import wavefront as wf
from mlprobs_tpu.ops.pallas import wavefront_kernel as wk


def _batch(lp=128, b=8, lo=40, hi=100, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(lo, hi, size=b)
    X = np.full((b, lp), 20, np.int8)
    Y = np.full((b, lp), 20, np.int8)
    for k in range(b):
        X[k, : lens[k]] = rng.integers(0, 20, lens[k])
        Y[k, : lens[k]] = rng.integers(0, 20, lens[k])
    return (
        jnp.asarray(X), jnp.asarray(Y),
        jnp.asarray(lens.astype(np.int32)),
    )


def _scan_posterior(X, Y, L, tabs_f, tabs_r, models):
    b, lp = X.shape
    zero = jnp.zeros((b,), jnp.int32)
    fwd = wf.wavefront_forward(
        X, Y, zero, zero, L, L, tabs_f, models=models
    )
    rev = wf.wavefront_forward(
        X[:, ::-1], Y[:, ::-1], lp - L, lp - L, L, L, tabs_r,
        models=models, emit_pre=True,
    )
    acc = None
    for m in models:
        p = wf.posterior_skew(fwd, rev, m)
        acc = p * p if acc is None else acc + p * p
    return jnp.sqrt(acc / len(models))


@pytest.mark.parametrize(
    "mode,models",
    [
        ("hmm5", ("hmm5",)),
        ("partition", ("partition",)),
        ("local", ("local",)),
        ("mix", ("hmm5", "partition", "local")),
    ],
)
def test_posterior_pallas_matches_scan(mode, models):
    X, Y, L = _batch()
    tabs_f, tabs_r = pairwise._wf_tables(
        "mix" if mode == "mix" else mode, None
    )
    post, score, nb = wk.posterior_pallas(
        X, Y, L, L, tabs_f, tabs_r, models=models,
        with_matches=True, interpret=True,
    )
    want = _scan_posterior(X, Y, L, tabs_f, tabs_r, models)
    D, _, W = want.shape
    np.testing.assert_allclose(
        np.asarray(post)[:D, :, :W], np.asarray(want), atol=2e-4
    )
    # padded rows/lanes beyond the true extents must be exactly zero
    assert not np.any(np.asarray(post)[D:])
    assert not np.any(np.asarray(post)[:, :, W:])
    s_want, nb_want = wf.mwt_skew(want, L, L, with_matches=True)
    np.testing.assert_allclose(
        np.asarray(score), np.asarray(s_want), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(nb), np.asarray(nb_want))


def test_posterior_pallas_fused_topk():
    """topk fused into the combine kernel == XLA top_k over the plane."""
    X, Y, L = _batch(seed=7)
    tabs_f, tabs_r = pairwise._wf_tables("qp", None)
    models = ("hmm5", "partition")
    post, score = wk.posterior_pallas(
        X, Y, L, L, tabs_f, tabs_r, models=models, interpret=True
    )
    vals_w, lanes_w = wf.topk_skew(post, 16, 0.01)
    vals_k, lanes_k, score_k = wk.posterior_pallas(
        X, Y, L, L, tabs_f, tabs_r, models=models,
        topk=16, cutoff=0.01, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(vals_k), np.asarray(vals_w), atol=1e-7
    )
    vw = np.asarray(vals_w)
    np.testing.assert_array_equal(
        np.asarray(lanes_k)[vw > 0], np.asarray(lanes_w)[vw > 0]
    )
    np.testing.assert_allclose(
        np.asarray(score_k), np.asarray(score), atol=1e-6
    )


def test_posterior_pallas_small_batch():
    """B smaller than the pair-block size (the long-pair regime)."""
    X, Y, L = _batch(lp=128, b=2, seed=3)
    tabs_f, tabs_r = pairwise._wf_tables("hmm5", None)
    post, score = wk.posterior_pallas(
        X, Y, L, L, tabs_f, tabs_r, models=("hmm5",), interpret=True
    )
    want = _scan_posterior(X, Y, L, tabs_f, tabs_r, ("hmm5",))
    D, _, W = want.shape
    np.testing.assert_allclose(
        np.asarray(post)[:D, :, :W], np.asarray(want), atol=2e-4
    )


def test_pallas_engine_routing(monkeypatch):
    """all_pairs_posteriors with engine=pallas equals engine=wavefront
    (CSR posteriors, scores, match counts) through the full host path."""
    import mlprobs_tpu.align.pairwise as pw

    rng = np.random.default_rng(11)
    seqs = [np.asarray(rng.integers(0, 20, n), np.int8)
            for n in (41, 57, 33)]

    def run(engine):
        monkeypatch.setattr(pw, "_engine", lambda: engine)
        out = {}
        for (i, j), csr, score, nb in pw.all_pairs_posteriors(
            seqs, mode="mix", leave_prob=0.3, with_matches=True
        ):
            out[(i, j)] = (csr.toarray(), score, nb)
        return out

    wfp = run("wavefront")
    plp = run("pallas")
    assert wfp.keys() == plp.keys()
    for k in wfp:
        aw, sw, nw = wfp[k]
        ap, sp_, np_ = plp[k]
        assert nw == np_
        np.testing.assert_allclose(sw, sp_, rtol=1e-4, atol=1e-3)
        both = (aw > 0) & (ap > 0)
        np.testing.assert_allclose(ap[both], aw[both], rtol=1e-3,
                                   atol=2e-5)
        strong_w = set(map(tuple, np.argwhere(aw >= 0.1)))
        strong_p = set(map(tuple, np.argwhere(ap >= 0.1)))
        assert strong_w == strong_p


def test_pallas_dense_fn_matches_wavefront(monkeypatch):
    """_wf_dense_fn (device-consistency feed) parity across engines."""
    import mlprobs_tpu.align.pairwise as pw

    X, Y, L = _batch(b=4, seed=5)
    tabs_f, tabs_r = pairwise._wf_tables("qp", None)
    models = pw._MODE_MODELS["qp"]

    monkeypatch.setattr(pw, "_engine", lambda: "wavefront")
    pw._wf_dense_fn.cache_clear()
    d_wf, s_wf = pw._wf_dense_fn(models)(X, Y, L, L, tabs_f, tabs_r)
    monkeypatch.setattr(pw, "_engine", lambda: "pallas")
    pw._wf_dense_fn.cache_clear()
    d_pl, s_pl = pw._wf_dense_fn(models)(X, Y, L, L, tabs_f, tabs_r)
    pw._wf_dense_fn.cache_clear()
    np.testing.assert_allclose(
        np.asarray(d_pl), np.asarray(d_wf), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(s_pl), np.asarray(s_wf), rtol=1e-4, atol=1e-3
    )
