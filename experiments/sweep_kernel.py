"""Sweep the fused-assembly kernel knobs at the bench's per-level shapes.

Usage: python experiments/sweep_kernel.py [L0|L1|combos...]
Prints chained ms/assembly per (gram_mode, row_slack, block) combo.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from correlation_tpu.config import FittingModel, Interpolation
from correlation_tpu.ops import assemble_v2 as v2
from correlation_tpu.ops.interp import sample_integer

S = 4096
N = 20


def build(level):
    """Replicate bench.py's per-level shapes: L0 = 21x21 px subsets on a
    1024^2 image (tile 32, block 40); L1 = 11x11 px on 512^2 (tile 24,
    block 64); L2 = 6x6 px on 256^2."""
    rng = np.random.default_rng(0)
    if level == "L0":
        img_hw, half, tile = 1024, 10, 32
    elif level == "L1":
        img_hw, half, tile = 512, 5, 24
    else:
        img_hw, half, tile = 256, 2, 24
    img = np.floor(rng.uniform(0, 255, (img_hw, img_hw, 1))).astype(
        np.float32
    )
    side = int(np.ceil(np.sqrt(S)))
    margin = 4 * half + 8
    coords = np.linspace(margin, img_hw - margin, side)
    centers = [(int(cx), int(cy)) for cy in coords for cx in coords][:S]
    pts = []
    for cx, cy in centers:
        gx, gy = np.meshgrid(
            np.arange(cx - half, cx + half + 1),
            np.arange(cy - half, cy + half + 1),
            indexing="ij",
        )
        pts.append(np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32))
    xy = np.stack(pts)
    p = xy.shape[1]
    p_pad = -(-p // 128) * 128
    xy = np.pad(xy, ((0, 0), (0, p_pad - p), (0, 0)))
    mask = np.zeros((S, p_pad), bool)
    mask[:, :p] = True
    center = np.asarray(centers, np.float32)
    params = np.tile(
        np.asarray([[0.3, -0.2, 1e-3, 0.0, 0.0, -1e-3]], np.float32),
        (S, 1),
    )
    img_j = jnp.asarray(img)
    xy_j = jnp.asarray(xy)
    mask_j = jnp.asarray(mask)
    und_w = sample_integer(img_j, xy_j) * mask_j[..., None]
    pixdata = v2.pack_pixdata(xy_j, mask_j, und_w, jnp.asarray(center))
    bbox = v2.subset_bbox(xy_j, mask_j)
    return img_j, pixdata, jnp.asarray(center), jnp.asarray(params), bbox, \
        img_hw, tile


def chain(img, pixdata, center, params, bbox, img_hw, tile, block,
          gram_mode, row_slack, parts):
    def body(i, carry):
        p, acc = carry
        out = v2.fused_assemble(
            FittingModel.AFFINE, Interpolation.BICUBIC, tile, tile,
            img_hw, img_hw, img, pixdata, center, p, bbox, block,
            tile_parts=parts, gram_mode=gram_mode, row_slack=row_slack,
        )
        return p + 1e-9 * out.b_vec, acc + out.chi

    run = jax.jit(lambda p0: jax.lax.fori_loop(
        0, N, body, (p0, jnp.zeros(S, jnp.float32))))
    out = run(params)
    jax.block_until_ready(out)
    np.asarray(out[1][:1])
    t0 = time.perf_counter()
    out = run(params)
    jax.block_until_ready(out)
    np.asarray(out[1][:1])
    return (time.perf_counter() - t0) / N


def main():
    level = sys.argv[1] if len(sys.argv) > 1 else "L0"
    prob = build(level)
    combos = []
    for gm in ("mask", "slice", "subset"):
        for rs in (False, True):
            combos.append((gm, rs))
    blocks = {"L0": [40], "L1": [64], "L2": [64]}[level]
    parts_list = [1, 3]
    for block in blocks:
        for gm, rs in combos:
            for parts in parts_list:
                try:
                    dt = chain(*prob, block, gm, rs, parts)
                    print(
                        f"{level} block={block} gram={gm:6s} "
                        f"slack={int(rs)} parts={parts}: "
                        f"{dt*1e3:7.3f} ms/assembly",
                        flush=True,
                    )
                except Exception as e:
                    print(f"{level} block={block} gram={gm} "
                          f"slack={int(rs)} parts={parts}: "
                          f"FAIL {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
