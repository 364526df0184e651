"""Tracing and throughput metering.

The reference instruments with NVTX ranges for nvvp (cuda_class.cu:133-319)
and compile-time wall-clock accumulators (DEBUG_TIME_* flags,
defines.hpp:57-72).  TPU equivalents: jax.profiler trace annotations (viewable
in TensorBoard / Perfetto) and an always-on solves/s meter.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_region(name: str):
    """Annotate a host-side region in the jax profiler trace (NVTX analog)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class SolveMeter:
    """Accumulates subsets-solved and wall time; reports solves/s."""

    def __init__(self):
        self.subsets = 0
        self.seconds = 0.0
        self.frames = 0

    @contextlib.contextmanager
    def measure(self, num_subsets: int):
        t0 = time.perf_counter()
        yield
        self.seconds += time.perf_counter() - t0
        self.subsets += num_subsets
        self.frames += 1

    @property
    def solves_per_s(self) -> float:
        return self.subsets / self.seconds if self.seconds else 0.0

    def summary(self) -> str:
        return (
            f"{self.subsets} subset solves over {self.frames} frames in "
            f"{self.seconds:.3f}s = {self.solves_per_s:.1f} solves/s"
        )


def start_trace(logdir: str):
    jax.profiler.start_trace(logdir)


def stop_trace():
    jax.profiler.stop_trace()
