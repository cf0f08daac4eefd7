"""Pallas kernel vs XLA row-scan equivalence (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from mlprobs_tpu.align import pairwise
from mlprobs_tpu.ops import pairhmm
from mlprobs_tpu.ops.pallas.hmm5_fwd import hmm5_forward_pallas


def test_pallas_fused_posterior_matches_scan():
    from mlprobs_tpu.ops.pallas.hmm5_bwd import hmm5_posterior_pallas

    p5 = pairwise.hmm5_dict()
    rng = np.random.default_rng(3)
    b, lx, ly = 8, 22, 18
    x = rng.integers(0, 20, (b, lx)).astype(np.int8)
    y = rng.integers(0, 20, (b, ly)).astype(np.int8)
    lxs = np.array([22, 17, 22, 9, 22, 22, 4, 22], np.int32)
    lys = np.array([18, 18, 12, 18, 6, 18, 18, 18], np.int32)
    post = np.asarray(
        hmm5_posterior_pallas(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(lxs),
            jnp.asarray(lys), p5, interpret=True,
        )
    )
    for k in range(b):
        want = np.asarray(
            pairhmm.hmm5_posterior(
                jnp.asarray(x[k]), jnp.asarray(y[k]),
                int(lxs[k]), int(lys[k]), p5,
            )
        )
        np.testing.assert_allclose(post[k], want, atol=2e-4)


def test_pallas_forward_matches_scan():
    p5 = pairwise.hmm5_dict()
    rng = np.random.default_rng(0)
    b, lx, ly = 8, 24, 20
    x = rng.integers(0, 20, (b, lx)).astype(np.int8)
    y = rng.integers(0, 20, (b, ly)).astype(np.int8)
    lxs = np.array([24, 20, 24, 10, 24, 24, 5, 24], np.int32)

    fm, states = hmm5_forward_pallas(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(lxs),
        p5["lmatch"], p5["lins"], p5["trans"], p5["init"],
        interpret=True,
    )
    fm = np.asarray(fm)
    states = np.asarray(states)
    for k in range(b):
        f_ref, s_ref = pairhmm.hmm5_forward(
            jnp.asarray(x[k]), jnp.asarray(y[k]), int(lxs[k]), ly, p5
        )
        f_ref = np.asarray(f_ref)
        got = fm[k][: lxs[k] + 1]
        want = f_ref[: lxs[k] + 1]
        mask = want > -1e29
        np.testing.assert_allclose(got[mask], want[mask], atol=1e-3)
        np.testing.assert_allclose(
            states[k, :, ly], np.asarray(s_ref)[lxs[k]], atol=1e-3
        )
