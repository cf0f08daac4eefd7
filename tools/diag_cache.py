"""Diagnose persistent-compile-cache misses across fresh processes.

Runs the feature pass (and optionally the base stage) on one family and
logs every persistent-cache hit/miss with its key.  Run twice in fresh
processes; the second run must be all hits.

Usage: python tools/diag_cache.py <fasta> [--base]
"""
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    logging.basicConfig(level=logging.DEBUG)
    for noisy in ("jax._src.dispatch", "jax._src.interpreters",
                  "jax._src.xla_bridge"):
        logging.getLogger(noisy).setLevel(logging.INFO)
    logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)
    logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)

    import numpy as np  # noqa: F401
    from mlprobs_tpu.core.fasta import read_fasta
    from mlprobs_tpu.core.alphabet import encode
    from mlprobs_tpu.align import aligner

    path = sys.argv[1]
    records = [(h, s) for h, s in read_fasta(path)]
    seqs = [encode(s) for _, s in records]
    t0 = time.time()
    st = aligner.family_viterbi_stats(seqs, with_features=True)
    print(f"[diag] feature pass: {time.time()-t0:.1f}s "
          f"avg_pid={st.avg_pid:.4f}", flush=True)
    if "--base" in sys.argv:
        t0 = time.time()
        out = aligner.align_family(records, config="pnp", stats=st)
        print(f"[diag] base stage: {time.time()-t0:.1f}s "
              f"width={out.width}", flush=True)


if __name__ == "__main__":
    main()
