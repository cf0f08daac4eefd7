#!/usr/bin/env python
"""One-off extraction of numeric parameter data from the MLProbs reference.

Produces mlprobs_tpu/models/assets/{params.npz,forests.npz}.

What is extracted is *data*, not code: published pair-HMM parameters
(ProbCons 1.12 lineage, reference Defaults.h), the Gonnet-160 substitution
matrix (reference MSAReadMatrix.h), BLOSUM62, the min-max normalisation
constants (classifier/model/*/para.txt) and the three trained
RandomForest classifiers re-serialised as flat node arrays
(classifier/model/*/randomforest.joblib, sklearn 0.21 pickles).

Run once:  python tools/extract_assets.py
"""
from __future__ import annotations

import re
import sys
import warnings
from pathlib import Path

import numpy as np

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parents[1] / "mlprobs_tpu" / "models" / "assets"

AMINO_ORDER = "ARNDCQEGHILKMFPSTWYV"


def _floats(text: str) -> list[float]:
    return [float(x) for x in re.findall(r"-?\d+\.?\d*(?:e[+-]?\d+)?", text)]


def _block(src: str, start_marker: str) -> str:
    """Return the brace-delimited initialiser that follows start_marker."""
    i = src.index(start_marker)
    i = src.index("{", i)
    depth, j = 0, i
    while True:
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                return src[i : j + 1]
        j += 1


def extract_hmm_params() -> dict[str, np.ndarray]:
    src = (REF / "baseMSA/C_P_NP_Aln/Defaults.h").read_text()
    out: dict[str, np.ndarray] = {}
    for name, key in [
        ("initDistrib1Default", "init1"),
        ("gapOpen1Default", "gap_open1"),
        ("gapExtend1Default", "gap_ext1"),
        ("initDistrib2Default", "init2"),
        ("gapOpen2Default", "gap_open2"),
        ("gapExtend2Default", "gap_ext2"),
        ("emitSingleDefault", "emit_single"),
    ]:
        vals = _floats(_block(src, name))
        out[key] = np.asarray(vals, dtype=np.float64)

    pairs_vals = _floats(_block(src, "emitPairsDefault"))
    ep = np.zeros((20, 20), dtype=np.float64)
    k = 0
    for i in range(20):
        row = pairs_vals[k : k + 20]
        k += 20
        ep[i, :] = row
    # stored row-major with zeros above the diagonal; symmetrise
    ep = np.where(ep == 0.0, ep.T, ep)
    out["emit_pairs"] = ep

    bl_vals = _floats(_block(src, "BLOSUM62"))
    out["blosum62"] = np.asarray(bl_vals, dtype=np.float64).reshape(20, 20)
    return out


def extract_gonnet() -> dict[str, np.ndarray]:
    src = (REF / "baseMSA/C_P_NP_Aln/MSAReadMatrix.h").read_text()
    block = _block(src, "score_matrix gonnet_160")
    m = re.search(r'"([A-Z]+)"', block)
    order = m.group(1)
    vals = _floats(block[m.end() :])
    n = len(order)
    tri = np.zeros((n, n), dtype=np.float64)
    k = 0
    for i in range(n):
        for j in range(i + 1):
            tri[i, j] = tri[j, i] = vals[k]
            k += 1
    # re-order into our 21-class alphabet (20 aa + X as unknown)
    out = np.zeros((21, 21), dtype=np.float64)
    idx = [order.index(c) for c in AMINO_ORDER] + [order.index("X")]
    for a, ia in enumerate(idx):
        for b, ib in enumerate(idx):
            out[a, b] = tri[ia, ib]
    return {"gonnet160": out}


def extract_vtml200() -> dict[str, np.ndarray]:
    """QuickProbs' default partition matrix (AminoAcidMatrices.hpp).

    Alphabet ARNDCQEGHILKMFPSTWYVBZX* (24 symbols, full square matrix);
    re-ordered into our 21-class alphabet with X as the unknown class.
    """
    src = (REF / "realign/QuickProbs/src/Alignment/Pairwise/"
                 "AminoAcidMatrices.hpp").read_text()
    block = _block(src, "const T Vtml200<T>::SCORES[]")
    vals = _floats(block)
    m = np.asarray(vals, dtype=np.float64).reshape(24, 24)
    order = "ARNDCQEGHILKMFPSTWYVBZX*"
    out = np.zeros((21, 21), dtype=np.float64)
    idx = [order.index(c) for c in AMINO_ORDER] + [order.index("X")]
    for a, ia in enumerate(idx):
        for b, ib in enumerate(idx):
            out[a, b] = m[ia, ib]
    return {"vtml200": out}


def extract_norms() -> dict[str, np.ndarray]:
    out = {}
    for tier in ["branch", "regions", "seq_lens"]:
        vals = [
            float(line)
            for line in (REF / f"classifier/model/{tier}/para.txt")
            .read_text()
            .splitlines()
            if line.strip()
        ]
        arr = np.asarray(vals, dtype=np.float64).reshape(-1, 2)  # (max, min)
        out[f"norm_{tier}"] = arr
    return out


def extract_forests() -> dict[str, np.ndarray]:
    from joblib.numpy_pickle import NumpyUnpickler

    class _Tree:
        def __init__(self, *a):
            self.args = a

        def __setstate__(self, state):
            self.state = state

    class _Obj:
        def __setstate__(self, state):
            self.__dict__.update(state)

    class _Unpickler(NumpyUnpickler):
        def find_class(self, module, name):
            if name == "Tree":
                return _Tree
            if name in ("DecisionTreeClassifier", "RandomForestClassifier"):
                return _Obj
            return super().find_class(module, name)

    out: dict[str, np.ndarray] = {}
    for tier in ["branch", "regions", "seq_lens"]:
        path = REF / f"classifier/model/{tier}/randomforest.joblib"
        with open(path, "rb") as f, warnings.catch_warnings():
            warnings.simplefilter("ignore")
            model = _Unpickler(str(path), f, ensure_native_byte_order=True).load()
        feats, thresh, left, right, value, tree_ofs = [], [], [], [], [], [0]
        for est in model.estimators_:
            st = est.tree_.state
            nodes = st["nodes"]
            feats.append(nodes["feature"])
            thresh.append(nodes["threshold"])
            left.append(nodes["left_child"])
            right.append(nodes["right_child"])
            # class-count values at each node; (n_nodes, 1, n_classes)
            value.append(st["values"][:, 0, :])
            tree_ofs.append(tree_ofs[-1] + st["node_count"])
        out[f"{tier}_feature"] = np.concatenate(feats).astype(np.int32)
        out[f"{tier}_threshold"] = np.concatenate(thresh).astype(np.float64)
        out[f"{tier}_left"] = np.concatenate(left).astype(np.int32)
        out[f"{tier}_right"] = np.concatenate(right).astype(np.int32)
        out[f"{tier}_value"] = np.concatenate(value).astype(np.float64)
        out[f"{tier}_offsets"] = np.asarray(tree_ofs, dtype=np.int32)
        out[f"{tier}_classes"] = np.asarray(model.classes_, dtype=np.int32)
    return out


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    params = {}
    params.update(extract_hmm_params())
    params.update(extract_gonnet())
    params.update(extract_vtml200())
    params.update(extract_norms())
    np.savez_compressed(OUT / "params.npz", **params)
    np.savez_compressed(OUT / "forests.npz", **extract_forests())
    print("wrote", OUT / "params.npz")
    for k, v in params.items():
        print(f"  {k}: {np.asarray(v).shape}")
    print("wrote", OUT / "forests.npz")


if __name__ == "__main__":
    sys.exit(main())
