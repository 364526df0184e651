"""Chained-assembly timing of the ablated v2 kernel (V2_ABLATE env)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np
import jax
import jax.numpy as jnp

from correlation_tpu.config import FittingModel, Interpolation
from micro_assemble import build

import ablate_v2 as v2


def main():
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = 30
    img, xy, mask, center, params = build(s)
    model = FittingModel.AFFINE
    interp = Interpolation.BICUBIC
    h, w = int(img.shape[0]), int(img.shape[1])
    tile = 32

    from correlation_tpu.ops.interp import sample_integer

    und_w = sample_integer(img, xy) * mask[..., None]
    pixdata = v2.pack_pixdata(xy, mask, und_w, center)
    bbox = v2.subset_bbox(xy, mask)
    block = int(os.environ.get("V2_BLOCK", "16"))

    def body(i, carry):
        p, acc = carry
        out = v2.fused_assemble(
            model, interp, tile, tile, h, w, img, pixdata, center, p,
            bbox, block, tile_parts=1,
        )
        p = p + 1e-9 * out.b_vec
        return p, acc + out.chi

    run = jax.jit(lambda p0: jax.lax.fori_loop(
        0, n, body, (p0, jnp.zeros(s, jnp.float32))))

    out = run(params)
    jax.block_until_ready(out)
    np.asarray(out[1][:1])
    t0 = time.perf_counter()
    out = run(params)
    jax.block_until_ready(out)
    np.asarray(out[1][:1])
    dt = (time.perf_counter() - t0) / n
    ab = os.environ.get("V2_ABLATE", "<full>")
    print(f"ablate={ab:24s} b={block}: {dt*1e3:8.3f} ms/assembly")


if __name__ == "__main__":
    main()
