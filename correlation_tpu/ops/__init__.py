from correlation_tpu.ops.interp import (
    InterpField,
    precompute_field,
    sample_field,
    sample_integer,
)
from correlation_tpu.ops.pyramid import build_pyramid, BINOMIAL_1D
from correlation_tpu.ops.assemble import assemble_normal_equations
from correlation_tpu.ops.solve import lm_delta

__all__ = [
    "InterpField",
    "precompute_field",
    "sample_field",
    "sample_integer",
    "build_pyramid",
    "BINOMIAL_1D",
    "assemble_normal_equations",
    "lm_delta",
]
