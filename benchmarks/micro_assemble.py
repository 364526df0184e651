"""Micro-benchmark: one batched normal-equation assembly, per backend.

Measures the hot-path building block in isolation (the analog of one
kCorrelation launch + reduction, correlationKernel.cu:122-268) at the
bench.py level-0 shapes: S subsets x 21x21 px, affine model, bicubic.

Usage: python benchmarks/micro_assemble.py [S] [backend ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from correlation_tpu.config import FittingModel, Interpolation


def build(s, img_hw=1024, half=10):
    rng = np.random.default_rng(0)
    img = np.floor(rng.uniform(0, 255, (img_hw, img_hw))).astype(np.float32)
    side = int(np.ceil(np.sqrt(s)))
    margin = 4 * half
    coords = np.linspace(margin, img_hw - margin, side)
    centers = []
    for cy in coords:
        for cx in coords:
            centers.append((int(cx), int(cy)))
            if len(centers) == s:
                break
        if len(centers) == s:
            break
    pts = []
    for cx, cy in centers:
        gx, gy = np.meshgrid(
            np.arange(cx - half, cx + half + 1),
            np.arange(cy - half, cy + half + 1),
            indexing="ij",
        )
        pts.append(np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32))
    xy = np.stack(pts)  # [S, 441, 2]
    p = xy.shape[1]
    p_pad = -(-p // 8) * 8
    xy = np.pad(xy, ((0, 0), (0, p_pad - p), (0, 0)))
    mask = np.zeros((s, p_pad), bool)
    mask[:, :p] = True
    center = np.asarray(centers, np.float32)
    params = np.tile(
        np.asarray([[0.3, -0.2, 1e-3, 0.0, 0.0, -1e-3]], np.float32), (s, 1)
    )
    return (
        jnp.asarray(img[..., None]),
        jnp.asarray(xy),
        jnp.asarray(mask),
        jnp.asarray(center),
        jnp.asarray(params),
    )


def timeit(fn, reps=20):
    out = fn()
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1])  # force readback
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    return (time.perf_counter() - t0) / reps


def main():
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    which = sys.argv[2:] or ["xla_sep", "v2"]
    img, xy, mask, center, params = build(s)
    model = FittingModel.AFFINE
    interp = Interpolation.BICUBIC
    h, w = int(img.shape[0]), int(img.shape[1])
    tile = 32  # 20 extent + 4 taps + 8 margin

    # sample und intensities once (iteration-invariant, like the engine)
    from correlation_tpu.ops.interp import sample_integer

    und_w = sample_integer(img, xy) * mask[..., None]

    if "xla_sep" in which:
        from correlation_tpu.ops.assemble import (
            assemble_normal_equations_tiles,
        )

        f = jax.jit(
            lambda p: assemble_normal_equations_tiles(
                model, interp, img, h, w, tile, tile,
                und_w, xy, mask, center, p,
            )
        )
        dt = timeit(lambda: f(params))
        print(f"xla_sep      S={s}: {dt*1e3:8.3f} ms/assembly")

    if "v2" in which:
        from correlation_tpu.ops import assemble_v2 as v2

        pixdata = v2.pack_pixdata(xy, mask, und_w, center)
        bbox = v2.subset_bbox(xy, mask)

        block = int(os.environ.get("V2_BLOCK", "16"))

        def f(p):
            return v2.fused_assemble(
                model, interp, tile, tile, h, w, img, pixdata,
                center, p, bbox, block, tile_parts=1,
            )

        f = jax.jit(f)
        dt = timeit(lambda: f(params))
        print(f"v2 (b={block:3d})  S={s}: {dt*1e3:8.3f} ms/assembly")


if __name__ == "__main__":
    main()
