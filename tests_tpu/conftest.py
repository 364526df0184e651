"""Hardware-only suite: runs on a real TPU, SKIPS VISIBLY elsewhere.

Unlike tests/ (which forces the CPU backend and a virtual 8-device mesh),
this directory uses whatever accelerator the session has.  Run it in the
bench environment so the benchmark numbers are produced by a suite that
covers the hardware code paths:

    python -m pytest tests_tpu/ -q
"""

import os
import sys

import pytest

# tests/ helpers (synthetic speckle fields) are shared with this suite
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests")
)


def pytest_collection_modifyitems(config, items):
    import jax

    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(
        reason=f"requires a real TPU (backend is {jax.default_backend()})"
    )
    for item in items:
        item.add_marker(skip)
