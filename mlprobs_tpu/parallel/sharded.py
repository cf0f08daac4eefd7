"""Multi-chip sharded pipeline stages.

`sharded_posterior_step` is the distributed form of the posterior stage:
the batch-of-pairs axis is sharded across chips (pure data parallelism —
each chip row-scans its pairs) and the consistency contraction
all-gathers the z-rows over ICI inside a shard_map.

This is what the reference cannot do at all (single process, OpenMP);
see SURVEY §2.9 / §5.8 for the mapping.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mlprobs_tpu.align import pairwise
from mlprobs_tpu.ops import mwt, pairhmm, partition


def _pair_posterior_and_score(x, y, lx, ly, p5, pl, pp):
    v1 = pairhmm.hmm5_posterior(x, y, lx, ly, p5)
    v2 = partition.partition_posterior(x, y, lx, ly, pp)
    v3 = pairhmm.local_posterior(x, y, lx, ly, pl)
    post = jnp.sqrt((v1 * v1 + v2 * v2 + v3 * v3) / 3.0)
    _, score = mwt.mwt_align(post, lx, ly)
    return post, score


def make_sharded_posterior_step(mesh: Mesh):
    """Jitted (X, Y, LX, LY) -> (posteriors, scores), pairs-sharded.

    X/Y: (B, Lp) int8 with B divisible by the mesh size; outputs keep the
    same sharding, so downstream per-shard work stays chip-local.
    """
    p5 = pairwise.hmm5_dict()
    pl = pairwise.local_dict()
    pp = pairwise.partition_dict()
    vfn = jax.vmap(
        _pair_posterior_and_score, in_axes=(0, 0, 0, 0, None, None, None)
    )

    def local_step(x, y, lx, ly):
        return vfn(x, y, lx, ly, p5, pl, pp)

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("pairs"), P("pairs"), P("pairs"), P("pairs")),
        out_specs=(P("pairs"), P("pairs")),
        check_rep=False,
    )
    return jax.jit(fn)


def make_sharded_consistency(mesh: Mesh, num_seqs: int,
                             cutoff: float = 0.01):
    """One consistency round over a pairs-sharded dense (N, N, Lp, Lp).

    The i-axis (rows of the pair matrix) is sharded; each chip all-gathers
    the full tensor's z-rows over ICI and contracts its local row block on
    the MXU:  R[i,j] = sum_z S[i,z] @ S[z,j].
    """

    def local_round(s_local):
        # s_local: (N/n_dev, N, Lp, Lp)
        s_all = jax.lax.all_gather(
            s_local, "pairs", axis=0, tiled=True
        )  # (N, N, Lp, Lp)
        r = jnp.einsum(
            "izab,zjbc->ijac",
            s_local,
            s_all,
            preferred_element_type=jnp.float32,
        ) / num_seqs
        support = s_local >= cutoff
        r = jnp.where(support, r, 0.0)
        return jnp.where(r >= cutoff, r, 0.0)

    fn = shard_map(
        local_round,
        mesh=mesh,
        in_specs=P("pairs"),
        out_specs=P("pairs"),
        check_rep=False,
    )
    return jax.jit(fn)
