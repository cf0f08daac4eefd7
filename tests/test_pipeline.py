"""Tests for region segmentation, classifiers and pipeline plumbing."""
import numpy as np

from mlprobs_tpu.models import forests
from mlprobs_tpu.pipeline import regions as reg
from mlprobs_tpu.pipeline.realign import avg_col_score
from mlprobs_tpu.core.msa import MSA


def _ref_unreliable(col_score, sigma, beta, min_len):
    """Literal transcription of unreliable_regions.py:9-44."""
    last = len(col_score) - 1
    out = []
    t1 = t2 = head = 0
    for item in range(len(col_score)):
        s = col_score[item]
        inside = beta <= s <= sigma
        if inside and t1 == 0:
            head, t1 = item + 1, 1
        elif inside and t1 == 1 and t2 == 0:
            t2 = 1
        elif inside and t1 == 1 and t2 == 1:
            if item == last and item - head > min_len:
                out.append((head, item))
        elif (not inside) and t1 == 1 and t2 == 1:
            if item - head > min_len:
                out.append((head, item))
            t1 = t2 = head = 0
        else:
            t1 = t2 = head = 0
    return out


def test_unreliable_regions_match_reference():
    rng = np.random.default_rng(3)
    for _ in range(50):
        scores = rng.random(40) * 3
        for cl, ml in reg.MIN_LEN_BY_CLASS.items():
            got = reg.find_unreliable_regions(list(scores), 1.2, 0.0, cl)
            want = _ref_unreliable(list(scores), 1.2, 0.0, ml)
            assert got == want


def test_partition_columns_cover_everything():
    rng = np.random.default_rng(5)
    for _ in range(30):
        scores = list(rng.random(50) * 3)
        regions = reg.find_unreliable_regions(scores, 1.2, 0.0, 0)
        blocks = reg.partition_columns(regions, 50)
        cols = []
        for b in blocks:
            assert b.start <= b.end
            cols.extend(range(b.start, b.end + 1))
        assert cols == list(range(50))


def test_classifiers_predict_in_range():
    c1 = forests.classify_strategy(0.3, 10, 200, 1.5, 0.2)
    assert c1 in (0, 1)
    c3 = forests.classify_realign_strategy(0.2, 0.3, 0.5, 1.0)
    assert c3 in (0, 1)
    c2 = forests.classify_region_min_length(200, 10, 0.3, 0.05, 1.0)
    assert c2 in (0, 1, 2, 3)


def test_classifier_normalisation_matches_reference_formula():
    f = forests._load()["branch"]
    feats = [0.3, 10, 200, 1.5, 0.2]
    got = f.normalise(feats)
    for k in range(5):
        mx, mn = f.norm[k]
        assert abs(got[k] - (feats[k] - mn) / (mx - mn)) < 1e-12


def test_avg_col_score_identical_blocks():
    m = MSA.from_records([("a", "ARN"), ("b", "ARN"), ("c", "ARN")])
    s = avg_col_score(m.rows)
    # identical residues: mean of diag blosum entries for A, R, N
    assert abs(s - (4 + 5 + 6) / 3) < 1e-9


def test_glibc_rand_reference_values():
    from mlprobs_tpu.utils.crand import GlibcRand

    g = GlibcRand(1)
    assert [g.rand() for _ in range(3)] == [
        1804289383, 846930886, 1681692777
    ]


def test_msf_and_clustal_input_parsing():
    """LoadMFA's alternative-format fallback (MultiSequence.h:267-295):
    ClustalW and MSF interleaved alignments parse like the reference."""
    from mlprobs_tpu.core.fasta import parse_fasta

    clustal = (
        "CLUSTAL W (1.83) multiple sequence alignment\n\n"
        "seq1   MKV-LA\nseq2   MKVQLA\n\n"
        "seq1   GDE\nseq2   GD-\n"
    )
    assert parse_fasta(clustal) == [
        ("seq1", "MKV-LAGDE"), ("seq2", "MKVQLAGD-")
    ]
    msf = (
        "PileUp\n\n   MSF: 6  Type: P  Check: 1 ..\n\n"
        " Name: alpha Len: 6\n Name: beta Len: 6\n\n//\n\n"
        "alpha  MKV.LA\nbeta   mkvqla\n"
    )
    assert parse_fasta(msf) == [
        ("alpha", "MKV-LA"), ("beta", "MKVQLA")
    ]
