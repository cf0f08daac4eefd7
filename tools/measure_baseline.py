#!/usr/bin/env python
"""Measure the reference CPU pipeline baseline (BASELINE.md steps 2-4).

Runs the reference pipeline per family with the reference *binaries*
(c_p_np_aln from baseMSA/, the prebuilt quickprobs) doing every aligner
stage, and re-expresses only the thin Python glue (MLProbs.py / utils/*)
with our classifier forests (identical decision trees extracted from
the shipped sklearn-0.21 pickles) and vectorised host utilities.  Using
fast glue *understates* the reference's true cost — its column scorer
alone is an O(L*N^2) pure-Python loop (calculate_column_scores.py:62-72)
— which is the conservative direction for a baseline we have to beat.

Outputs BASELINE_CPU.json with per-suite mean sec/family (stratified
sample or full suite) plus a posterior fill-rate measurement
(cells/s of the QuickProbs posterior stage) used by bench.py.

Usage:
  python tools/measure_baseline.py --sample 24            # stratified
  python tools/measure_baseline.py --suite bali3 --all    # whole suite
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mlprobs_tpu.core import alphabet  # noqa: E402
from mlprobs_tpu.core.fasta import parse_fasta, read_fasta  # noqa: E402
from mlprobs_tpu.core.msa import MSA  # noqa: E402
from mlprobs_tpu.models import forests  # noqa: E402
from mlprobs_tpu.ops.colscore import column_scores  # noqa: E402
from mlprobs_tpu.pipeline import regions as reg  # noqa: E402
from mlprobs_tpu.pipeline.driver import BETA, SIGMA, THRESHOLD  # noqa: E402
from mlprobs_tpu.pipeline.realign import avg_col_score  # noqa: E402

REF = Path("/root/reference")
CPNP = Path("/tmp/cpnp_build/c_p_np_aln")
QPROBS = REF / "realign/QuickProbs/bin/quickprobs"
SUITES = ("bali3", "ox", "oxx", "sabre")


def ensure_cpnp() -> None:
    if CPNP.exists():
        return
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    import conftest

    conftest._ensure_cpnp_binary()


def run_capture(args: list[str], timeout: float = 3600) -> str:
    res = subprocess.run(args, capture_output=True, text=True,
                         timeout=timeout)
    return res.stdout


def ref_pipeline_one(fam: Path, timeout: float = 3600) -> tuple[float, dict]:
    """One family through the reference pipeline; returns (seconds, info).

    Stage sequence mirrors MLProbs.py:36-99; aligner stages are the
    reference binaries via subprocess (the same process boundary the
    reference uses).
    """
    t0 = time.time()
    info: dict = {}
    # ---- classifier-1 features: c_p_np_aln -G ----------------------------
    out = run_capture([str(CPNP), "-G", str(fam)], timeout)
    fields = out.strip().split("\t")
    avg_pid, sd_pid = float(fields[0]), float(fields[1])
    num_seqs, avg_len = int(fields[2]), int(fields[3])
    avg_sp, peak, factor = (float(fields[4]), float(fields[5]),
                            float(fields[6]))
    strategy = forests.classify_strategy(
        avg_pid, num_seqs, avg_len, avg_sp, peak)
    info["strategy"] = strategy
    # ---- base MSA ---------------------------------------------------------
    if strategy < 2:
        msa_text = run_capture(
            [str(CPNP), "-p", str(strategy), str(fam)], timeout)
    else:
        msa_text = run_capture([str(QPROBS), str(fam)], timeout)
    base = MSA.from_records(parse_fasta(msa_text)).sort_by_header()
    # ---- column scores + classifiers 3/2 + segmentation -------------------
    col = column_scores(base.rows)
    un_sp = float(col.mean()) if col.size else 0.0
    sd_un_sp = float(np.sqrt(((col - un_sp) ** 2).mean())) if col.size else 0.0
    pk = float((col >= 1.0).mean()) if col.size else 0.0
    mode = forests.classify_realign_strategy(pk, avg_pid, sd_un_sp, un_sp)
    info["realign_mode"] = mode
    if mode == 1:
        cls = forests.classify_region_min_length(
            base.length, base.num_seqs, avg_pid, sd_pid, un_sp)
        found = reg.find_unreliable_regions(list(col), SIGMA, BETA, cls)
    else:
        found = reg.find_reliable_regions(list(col), THRESHOLD, 0)
    blocks = reg.partition_columns(found, base.length)
    # ---- block realignment with quickprobs --------------------------------
    do_blocks = mode == 1 or factor > 0
    if mode == 0 and factor <= 0:
        msa_text = run_capture([str(QPROBS), str(fam)], timeout)
        info["whole_family_requickprobs"] = True
    else:
        n_re = 0
        for blk in blocks:
            if not (blk.realign and do_blocks):
                continue
            piece = base.rows[:, blk.start: blk.end + 1]
            keep = [i for i in range(base.num_seqs)
                    if (piece[i] >= 0).any()]
            if len(keep) < 2:
                continue
            with tempfile.NamedTemporaryFile(
                    "w", suffix=".fasta", delete=False) as f:
                for i in keep:
                    f.write(f">{base.headers[i]}\n")
                    f.write(alphabet.decode(piece[i]).replace("-", "") + "\n")
                tmp = f.name
            try:
                new_text = run_capture([str(QPROBS), tmp], timeout)
                new = MSA.from_records(parse_fasta(new_text)).sort_by_header()
                # acceptance test (do_realign.py:64-70)
                _ = avg_col_score(piece[keep]) > avg_col_score(new.rows)
                n_re += 1
            finally:
                os.unlink(tmp)
        info["blocks_realigned"] = n_re
    return time.time() - t0, info


def posterior_fill_rate() -> dict:
    """Reference posterior fill rate on posterior-dominated synthetic runs.

    cells = sum over pairs of li*lj (the combined-posterior plane, the
    same unit bench.py counts).  With few long sequences the QuickProbs
    runtime is dominated by the posterior stage (everything downstream
    is O(N^3 * sparsity * L) or O(N * L^2) with tiny N), so wall-clock
    is an upper bound on its posterior time and cells/wall a *lower*
    bound on its fill rate — but a tight one, and measured, not guessed.
    """
    rng = np.random.default_rng(0)
    aas = np.array(list("ARNDCQEGHILKMFPSTWYV"))
    results = []
    for n, L in ((6, 800), (8, 1000)):
        with tempfile.NamedTemporaryFile(
                "w", suffix=".fasta", delete=False) as f:
            base = rng.integers(0, 20, L)
            for s in range(n):
                seq = base.copy()
                mut = rng.random(L) < 0.3
                seq[mut] = rng.integers(0, 20, mut.sum())
                f.write(f">s{s}\n" + "".join(aas[seq]) + "\n")
            tmp = f.name
        try:
            t0 = time.time()
            run_capture([str(QPROBS), tmp], timeout=3600)
            dt = time.time() - t0
        finally:
            os.unlink(tmp)
        cells = (n * (n - 1) // 2) * L * L
        results.append({"n": n, "L": L, "seconds": dt,
                        "cells": cells, "cells_per_sec": cells / dt})
    return {
        "runs": results,
        "cells_per_sec": max(r["cells_per_sec"] for r in results),
    }


def stratified_sample(files: list[Path], k: int) -> list[Path]:
    """k families spread evenly across the size distribution."""
    by_size = sorted(files, key=lambda p: p.stat().st_size)
    if k >= len(by_size):
        return by_size
    idx = np.linspace(0, len(by_size) - 1, k).round().astype(int)
    return [by_size[i] for i in idx]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sample", type=int, default=24,
                    help="families per suite (stratified by size)")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--suite", action="append", choices=SUITES)
    ap.add_argument("--timeout", type=float, default=1800.0,
                    help="per-binary-call timeout (s)")
    ap.add_argument("--out", default="BASELINE_CPU.json")
    ap.add_argument("--skip-fill-rate", action="store_true")
    args = ap.parse_args()

    ensure_cpnp()
    report: dict = {"host_cpus": os.cpu_count(), "suites": {}}
    if not args.skip_fill_rate:
        print("[fill-rate] measuring quickprobs posterior fill rate...",
              flush=True)
        report["posterior_fill"] = posterior_fill_rate()
        print(json.dumps(report["posterior_fill"]["runs"]), flush=True)

    for suite in (args.suite or SUITES):
        files = sorted((REF / "TEST" / suite / "in").iterdir())
        fams = files if args.all else stratified_sample(files, args.sample)
        times, fails = [], 0
        for i, fam in enumerate(fams):
            try:
                dt, info = ref_pipeline_one(fam, timeout=args.timeout)
                times.append({"family": fam.name, "seconds": dt, **info})
                print(f"[{suite} {i+1}/{len(fams)}] {fam.name}: "
                      f"{dt:.2f}s", flush=True)
            except Exception as e:  # timeouts / crashes recorded, not fatal
                fails += 1
                print(f"[{suite}] {fam.name}: FAILED ({e})", flush=True)
            # checkpoint as we go so partial runs are usable
            report["suites"][suite] = {
                "sampled": len(fams), "failed": fails,
                "mean_sec_per_family": (
                    float(np.mean([t["seconds"] for t in times]))
                    if times else None),
                "median_sec_per_family": (
                    float(np.median([t["seconds"] for t in times]))
                    if times else None),
                "families": times,
            }
            Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps({s: {k: v for k, v in d.items() if k != "families"}
                      for s, d in report["suites"].items()}, indent=1))


if __name__ == "__main__":
    main()
