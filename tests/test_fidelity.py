"""QuickProbs fidelity: RNG streams, selectivity prep, refinement."""
import numpy as np
import pytest

from mlprobs_tpu.align import consistency as cons
from mlprobs_tpu.align import tree_extra
from mlprobs_tpu.align.refine_qp import (
    check_acceptance,
    column_refinement,
    entropy_evaluator,
    update_column_scores,
)
from mlprobs_tpu.core.msa import MSA
from mlprobs_tpu.utils import qprand


def test_mt19937_matches_std():
    """numpy RandomState(5489) == std::mt19937 default stream."""
    eng = qprand.Mt19937Stream()
    got = [eng.raw() for _ in range(5)]
    assert got == [3499211612, 581869302, 3890346734, 3586334585,
                   545404204]


def test_det_uniform_int_matches_reference_modulo():
    """det_uniform_int_distribution = raw % (hi-lo+1) + lo with top
    sliver rejection (deterministic_random.h:128-141)."""
    eng = qprand.Mt19937Stream()
    vals = [eng.det_uniform_int(0, qprand.RND_MAX) for _ in range(4)]
    want = [
        3499211612 % 65537, 581869302 % 65537,
        3890346734 % 65537, 3586334585 % 65537,
    ]
    assert vals == want


def test_parkmiller75():
    """deterministic_random.cpp: seed * 75 % 65537."""
    assert qprand.parkmiller75(1) == 75
    assert qprand.parkmiller75(65536) == (65536 * 75) % 65537


def test_consistency_seed_matrix_shape_and_range():
    seeds = qprand.consistency_seed_matrix(4)
    assert seeds.shape == (4, 4)
    assert (seeds >= 0).all() and (seeds <= qprand.RND_MAX).all()
    # first entry is the first det_uniform draw
    assert seeds[0, 0] == 3499211612 % 65537


def test_z_acceptance_deterministic_filter():
    """Deterministic filter at x<=a yields 2.0 -> always accepted
    (parkmiller75 output * RND_MAX_INV is at most ~1.003)."""
    d = np.full((5, 5), 10.0)
    seeds = qprand.consistency_seed_matrix(5)
    acc = cons.z_acceptance(d, 0, 1, int(seeds[0, 1]),
                            selectivity=200.0)
    assert acc == [2, 3, 4]
    # above the bound: never accepted
    d2 = np.full((5, 5), 500.0)
    acc2 = cons.z_acceptance(d2, 0, 1, int(seeds[0, 1]),
                             selectivity=200.0)
    assert acc2 == []


def test_selectivity_distance_modes():
    rng = np.random.default_rng(0)
    dist = rng.random((6, 6))
    dist = (dist + dist.T) / 2
    sub = np.arange(36, dtype=float).reshape(6, 6)
    got = cons.selectivity_distances("similarity", dist)
    np.testing.assert_allclose(got, dist.astype(np.float32))
    got = cons.selectivity_distances("subtree", dist, subtree=sub)
    np.testing.assert_allclose(got, sub.astype(np.float32))
    seed_mode = cons.selectivity_distances(
        "seed", dist, selectivity=3.0
    )
    ids = qprand.seed_selection_ids(6, 3)
    for s in ids:
        assert (seed_mode[s] == 0).all() and (seed_mode[:, s] == 0).all()


def test_selectivity_normalizations():
    d = np.array([[0.0, 4.0], [4.0, 0.0]])
    got = cons.selectivity_distances("similarity", d,
                                     normalization="stochastic")
    assert got.max() == 1.0
    # ranked: diag forced to max -> diag entries rank first (desc)
    got = cons.selectivity_distances("similarity", d,
                                     normalization="ranked")
    assert got.shape == (2, 2)
    assert got[0, 0] < got[1, 1]  # stable: first diag outranks second
    got = cons.selectivity_distances("similarity", d,
                                     normalization="rankedrow")
    # each row: diag (max) gets rank 0, the other rank 1, / n
    np.testing.assert_allclose(got, [[0.0, 0.5], [0.5, 0.0]])


def test_saturate_weights():
    w = np.array([0.0, 1e-9, 0.5])
    np.testing.assert_allclose(
        cons.saturate_weights(w), [1e-6, 1e-6, 0.5]
    )


def test_update_column_scores_reference_semantics():
    # 4 sequences: column 1 has 2 gaps (|2-2|=0 dev), column 2 has 1
    # gap (dev 1); zero-gap columns dropped; larger deviation first
    m = MSA.from_records([
        ("a", "A-RN"), ("b", "A-RN"), ("c", "AC-N"), ("d", "ACRN"),
    ])
    scores = update_column_scores(m, ignore_terminal_gaps=False)
    assert scores == [(2, 1.0), (1, 2.0)]


def test_update_column_scores_terminal_gaps():
    # leading gap of sequence b is terminal -> not counted
    m = MSA.from_records([("a", "ARN"), ("b", "-RN")])
    assert update_column_scores(m, ignore_terminal_gaps=True) == []
    assert update_column_scores(m, ignore_terminal_gaps=False) == [
        (0, 1.0)
    ]


def test_entropy_evaluator_prefers_conserved():
    cons_msa = MSA.from_records([("a", "AAAA"), ("b", "AAAA")])
    div_msa = MSA.from_records([("a", "ARND"), ("b", "NDAR")])
    assert entropy_evaluator(cons_msa) > entropy_evaluator(div_msa)


def test_check_acceptance_length_and_entropy():
    short = MSA.from_records([("a", "ARN"), ("b", "ARN")])
    long_ = MSA.from_records([("a", "AR-N"), ("b", "-ARN")])
    assert check_acceptance(long_, short)          # shorter accepted
    assert not check_acceptance(short, long_)      # longer rejected
    assert check_acceptance(
        short, short, acceptance_length=False, acceptance_entropy=True
    )


def test_newick_roundtrip_and_phylip():
    from mlprobs_tpu.align.tree_extra import (
        parse_newick, parse_phylip_tree, to_newick,
    )

    t = parse_newick("((a:0.1,b:0.2):0.05,c:0.3);",
                     names=["a", "b", "c"])
    assert t.left.left.idx == 0 and t.left.right.idx == 1
    assert t.right.idx == 2 and abs(t.right.dist - 0.3) < 1e-9
    # serialise + reparse keeps topology
    text = to_newick(t)
    t2 = parse_newick(text, names=None)
    assert t2.left.left.idx == 0 and t2.right.idx == 2
    t3 = parse_phylip_tree(" ((0:0.1,\n 1:0.2):0.0,2:0.3);\n")
    assert t3.right.idx == 2


def test_slink_matches_scipy_single_linkage():
    from scipy.cluster.hierarchy import linkage
    from mlprobs_tpu.align.tree import leaves

    rng = np.random.default_rng(3)
    pts = rng.random((6, 2))
    d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    root = tree_extra.slink(d)
    # same first merge as scipy single linkage
    z = linkage(d[np.triu_indices(6, 1)], method="single")
    first = {int(z[0, 0]), int(z[0, 1])}

    def depth_of(node, target, depth=0):
        if node.leaf:
            return depth if node.idx in target else None
        a = depth_of(node.left, target, depth + 1)
        b = depth_of(node.right, target, depth + 1)
        return a if a is not None else b

    # the two closest points must be siblings (maximum depth pair)
    def siblings(node):
        if node.leaf:
            return set()
        if node.left.leaf and node.right.leaf:
            return {frozenset({node.left.idx, node.right.idx})}
        return siblings(node.left) | siblings(node.right)

    assert frozenset(first) in siblings(root)
    assert sorted(l for l in _leaf_ids(root)) == list(range(6))


def _leaf_ids(node):
    if node.leaf:
        return [node.idx]
    return _leaf_ids(node.left) + _leaf_ids(node.right)


def test_chained_tree_shape():
    root = tree_extra.chained(5)
    assert _leaf_ids(root) == [0, 1, 2, 3, 4]
    # left-deep chain
    node, depth = root, 0
    while not node.leaf:
        node = node.left
        depth += 1
    assert depth == 4


def test_config_is_source_of_constants():
    from mlprobs_tpu.align import pairwise
    from mlprobs_tpu.core.config import DEFAULT
    from mlprobs_tpu.pipeline import driver

    assert pairwise.TOPK == DEFAULT.engine.topk_per_row
    assert pairwise.CUTOFF == DEFAULT.aligner.posterior_cutoff
    assert driver.SIGMA == DEFAULT.pipeline.sigma


def test_stats_registry_records_pipeline_stages():
    from mlprobs_tpu.pipeline.driver import run_pipeline
    from mlprobs_tpu.utils.stats import GLOBAL

    GLOBAL.reset()
    recs = [("a", "ARNDC"), ("b", "ARNDC"), ("c", "ARNEC")]
    out, rep = run_pipeline(recs)
    assert out.num_seqs == 3
    stats = GLOBAL.to_dict()
    assert "time.stage.features" in stats
    assert "time.stage.total" in stats
