"""wfa_tpu — a TPU-native wavefront-alignment (WFA) framework.

A from-scratch JAX/XLA/Pallas re-design of the gap-affine wavefront
alignment algorithm (Marco-Sola et al. 2020) with the same capabilities
and bit-identical outputs (scores, CIGARs, coordinates, stats) as the
reference Go implementation:

* distance metric: gap-affine
* alignment types: global, semi-global
* heuristic: wf-adaptive reduction

Layers:

* :mod:`wfa_tpu.oracle`  — exact scalar executable spec (correctness oracle)
* :mod:`wfa_tpu.engine`  — batched TPU score-loop engine (JAX / Pallas)
* :mod:`wfa_tpu.cigar`   — CIGAR op-runs, stats, text rendering
* :mod:`wfa_tpu.parallel`— data-parallel sharding over device meshes
* :mod:`wfa_tpu.cli`     — the ``wfa-tpu`` command-line tool
"""

from .cigar import AlignmentResult
from .constants import (
    DEFAULT_ADAPTIVE,
    DEFAULT_OPTIONS,
    DEFAULT_PENALTIES,
    MAX_SEQ_LEN,
    AdaptiveReductionOption,
    EmptySeqError,
    Options,
    Penalties,
    SeqTooLongError,
)
from .oracle import Aligner as OracleAligner
from .oracle import align as oracle_align

__version__ = "0.1.0"

__all__ = [
    "AlignmentResult",
    "AdaptiveReductionOption",
    "DEFAULT_ADAPTIVE",
    "DEFAULT_OPTIONS",
    "DEFAULT_PENALTIES",
    "EmptySeqError",
    "MAX_SEQ_LEN",
    "Options",
    "OracleAligner",
    "Penalties",
    "SeqTooLongError",
    "oracle_align",
]
