"""correlation_tpu — a TPU-native batched Digital Image Correlation framework.

A from-scratch reimplementation of the capabilities of namascar/correlation
(Lucas-Kanade DIC via Levenberg-Marquardt damped Gauss-Newton over parametric
subset warps) redesigned for TPU hardware:

* thousands of subsets are batched as a leading array axis and solved
  simultaneously inside one jit'd program (the reference solves sectors
  serially, see /root/reference/manager_class.cpp:304-547),
* subpixel interpolation coefficients are precomputed as a coefficient field
  via an MXU convolution (the batched analog of the per-pixel memoization in
  interpolation_class.cpp:228-241),
* Gauss-Newton normal equations are assembled with batched matmuls and solved
  with batched Cholesky factorizations,
* per-subset divergent LM control flow runs as a masked lax.while_loop,
* the subset axis shards over a jax device Mesh for multi-chip scaling.
"""

from correlation_tpu.config import (
    FittingModel,
    Interpolation,
    DeformationDescription,
    ErrorMode,
    ReferenceImage,
    ErrorCode,
    SolverConfig,
    PyramidConfig,
)
from correlation_tpu.engine import (
    correlate,
    correlate_many,
    CorrelationResult,
)
from correlation_tpu.domains import combine_batches, split_result
from correlation_tpu.sequence import SequenceConfig, run_sequence

__version__ = "0.1.0"

__all__ = [
    "FittingModel",
    "Interpolation",
    "DeformationDescription",
    "ErrorMode",
    "ReferenceImage",
    "ErrorCode",
    "SolverConfig",
    "PyramidConfig",
    "SequenceConfig",
    "correlate",
    "correlate_many",
    "combine_batches",
    "split_result",
    "CorrelationResult",
    "run_sequence",
]
