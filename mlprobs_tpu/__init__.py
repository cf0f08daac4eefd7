"""mlprobs_tpu — a TPU-native MSA engine with the capabilities of MLProbs.

A ground-up JAX/XLA/Pallas re-design of the MLProbs data-centric MSA
pipeline (reference: kuangmeng/MLProbs).  The pipeline chains:

  1. family feature extraction (all-pairs Viterbi percent identity),
  2. a strategy classifier choosing progressive / non-progressive alignment,
  3. a probabilistic-consistency base aligner (pair-HMM + partition-function
     posteriors, consistency transform, guide tree, profile-profile merges,
     iterative refinement),
  4. column reliability scoring, region segmentation classifiers,
  5. selective realignment of column blocks with a QuickProbs-style aligner,
  6. acceptance testing and recombination into the final MSA.

All O(L^2) dynamic programs run as batched JAX row-scans / Pallas kernels on
TPU; the O(N^3 L) consistency transform runs as one masked block matmul on
the MXU; host code handles trees, traceback and orchestration.
"""

__version__ = "0.1.0"

from mlprobs_tpu.utils import jaxcache as _jaxcache

_jaxcache.enable()

from mlprobs_tpu.core.fasta import read_fasta, write_fasta  # noqa: F401
from mlprobs_tpu.core.msa import MSA  # noqa: F401
