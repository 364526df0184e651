"""Experiment: does Mosaic lower a per-lane sublane gather inside a Pallas
TPU kernel?  If yes, the one-hot selection matmul in assemble_v2 can become
a real gather (out[i, j] = src[idx[i, j], j])."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, P = 64, 512


def kernel(src_ref, idx_ref, out_ref):
    src = src_ref[:]  # [TH, P]
    idx = idx_ref[:]  # [16, P] int32
    out_ref[:] = jnp.take_along_axis(src, idx, axis=0)


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((TH, P)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, TH, (16, P)), jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, P), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(src, idx)
    ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=0)
    err = np.abs(np.asarray(out) - ref).max()
    print("take_along_axis sublane gather: OK, max err", err)


if __name__ == "__main__":
    main()
