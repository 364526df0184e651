"""In-loop assembly cost: N chained assemblies inside one jit per backend.

Mimics engine.solve_level's while_loop conditions (each assembly feeds the
next through a tiny param perturbation, forcing serialization) to measure
the marginal per-assembly cost without per-call dispatch overhead.

Usage: python benchmarks/chain_assemble.py [S] [N] [backend ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from correlation_tpu.config import FittingModel, Interpolation
from micro_assemble import build


def main():
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    which = sys.argv[3:] or ["xla_sep", "v2"]
    img, xy, mask, center, params = build(s)
    model = FittingModel.AFFINE
    interp = Interpolation.BICUBIC
    h, w = int(img.shape[0]), int(img.shape[1])
    tile = 32

    from correlation_tpu.ops.interp import sample_integer

    und_w = sample_integer(img, xy) * mask[..., None]

    def chain(assemble):
        def body(i, carry):
            p, acc = carry
            a, b, chi, err = assemble(p)
            # tiny, data-dependent perturbation to serialize iterations
            p = p + 1e-9 * b[:, : p.shape[1]]
            return p, acc + chi

        def run(p0):
            return jax.lax.fori_loop(
                0, n, body, (p0, jnp.zeros(s, jnp.float32))
            )

        return jax.jit(run)

    def timeit(fn):
        out = fn(params)
        jax.block_until_ready(out)
        np.asarray(out[1][:1])
        t0 = time.perf_counter()
        out = fn(params)
        jax.block_until_ready(out)
        np.asarray(out[1][:1])
        return (time.perf_counter() - t0) / n

    if "xla_sep" in which:
        from correlation_tpu.ops.assemble import (
            assemble_normal_equations_tiles,
        )

        f = chain(
            lambda p: assemble_normal_equations_tiles(
                model, interp, img, h, w, tile, tile,
                und_w, xy, mask, center, p,
            )
        )
        print(f"xla_sep  chained S={s}: {timeit(f)*1e3:8.3f} ms/assembly")

    if "v2" in which:
        from correlation_tpu.ops import assemble_v2 as v2

        pixdata = v2.pack_pixdata(xy, mask, und_w, center)
        bbox = v2.subset_bbox(xy, mask)
        block = int(os.environ.get("V2_BLOCK", "16"))

        f = chain(
            lambda p: v2.fused_assemble(
                model, interp, tile, tile, h, w, img, pixdata,
                center, p, bbox, block, tile_parts=1,
            )
        )
        print(
            f"v2 (b={block:3d}) chained S={s}:"
            f" {timeit(f)*1e3:8.3f} ms/assembly"
        )


if __name__ == "__main__":
    main()
