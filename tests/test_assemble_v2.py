"""Fused-assembly Pallas kernel (ops/assemble_v2.py) vs the XLA paths.

Runs in Pallas interpret mode so it executes on the CPU test mesh; the same
code compiles to Mosaic on real TPU (validated on a v5e).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from correlation_tpu.config import (
    FittingModel,
    Interpolation,
    PyramidConfig,
    SolverConfig,
)
from correlation_tpu.domains import make_batch
from correlation_tpu.engine import correlate
from correlation_tpu.ops import assemble_v2 as v2
from correlation_tpu.ops.assemble import assemble_normal_equations
from correlation_tpu.ops.interp import precompute_field
from synthetic import Speckle


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = v2.pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(v2.pl, "pallas_call", patched)
    # static-arg jit caches must not leak compiled (non-interpret) versions
    v2.fused_assemble.clear_cache()
    yield
    v2.fused_assemble.clear_cache()


def _problem(model, interp, s=5, side=11, channels=1):
    spk = Speckle(96, 130, seed=9)
    und = np.floor(spk.image())
    dfm = np.floor(spk.warped_image(u=0.7, v=-0.4))
    if channels > 1:
        und = np.stack([und * f for f in (1.0, 0.8, 0.6)[:channels]], -1)
        dfm = np.stack([dfm * f for f in (1.0, 0.8, 0.6)[:channels]], -1)
    else:
        und = und[..., None]
        dfm = dfm[..., None]
    xy = np.zeros((s, side * side, 2), np.float32)
    for i in range(s):
        cx, cy = 20 + 13 * i, 25 + 9 * i
        gx, gy = np.meshgrid(
            np.arange(cx - side // 2, cx + side // 2 + 1),
            np.arange(cy - side // 2, cy + side // 2 + 1),
            indexing="ij",
        )
        xy[i] = np.stack([gx.ravel(), gy.ravel()], -1)
    mask = np.ones((s, side * side), bool)
    center = xy.mean(axis=1).astype(np.float32)
    und_w = und[
        xy[..., 1].astype(int), xy[..., 0].astype(int), :
    ].astype(np.float32)
    rng = np.random.default_rng(4)
    num_p = {FittingModel.U: 1, FittingModel.UV: 2, FittingModel.UVQ: 3,
             FittingModel.AFFINE: 6}[model]
    params = rng.normal(0, 0.01, (s, num_p)).astype(np.float32)
    params[:, 0] += 0.7
    if num_p > 1:
        params[:, 1] -= 0.4
    return und, dfm, xy, mask, center, und_w, params


def _run_v2(model, interp, dfm, xy, mask, center, und_w, params, block=2):
    h, w = dfm.shape[0], dfm.shape[1]
    pix = v2.pack_pixdata(
        jnp.asarray(xy), jnp.asarray(mask), jnp.asarray(und_w),
        jnp.asarray(center),
    )
    bbox = v2.subset_bbox(jnp.asarray(xy), jnp.asarray(mask))
    ext = int(np.ceil((xy.max(axis=1) - xy.min(axis=1)).max()))
    th, tw = v2.choose_tile(ext, ext, -(-h // 8) * 8, -(-w // 8) * 8)
    return v2.fused_assemble(
        model, interp, th, tw, h, w, jnp.asarray(dfm), pix,
        jnp.asarray(center), jnp.asarray(params), bbox, block,
    )


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize(
    "model,interp",
    [
        (FittingModel.AFFINE, Interpolation.BICUBIC),
        (FittingModel.UV, Interpolation.BILINEAR),
        (FittingModel.UVQ, Interpolation.BICUBIC),
        (FittingModel.U, Interpolation.NEAREST),
    ],
)
def test_fused_assembly_matches_xla(model, interp, channels):
    und, dfm, xy, mask, center, und_w, params = _problem(
        model, interp, channels=channels
    )
    out = _run_v2(model, interp, dfm, xy, mask, center, und_w, params)

    # Tight oracle: the xla_sep tiles backend evaluates the SAME separable
    # Catmull-Rom form, so agreement is pure f32 accumulation-order noise.
    h, w = dfm.shape[0], dfm.shape[1]
    ext = int(np.ceil((xy.max(axis=1) - xy.min(axis=1)).max()))
    th, tw = v2.choose_tile(ext, ext, -(-h // 8) * 8, -(-w // 8) * 8)
    from correlation_tpu.ops.assemble import assemble_normal_equations_tiles

    a0, b0, chi0, err0 = assemble_normal_equations_tiles(
        model, interp, jnp.asarray(dfm), h, w, th, tw,
        jnp.asarray(und_w), jnp.asarray(xy), jnp.asarray(mask),
        jnp.asarray(center), jnp.asarray(params),
    )
    np.testing.assert_allclose(
        out.a_mat, a0, rtol=2e-4, atol=np.abs(np.asarray(a0)).max() * 5e-6
    )
    np.testing.assert_allclose(
        out.b_vec, b0, rtol=2e-4, atol=np.abs(np.asarray(b0)).max() * 2e-5
    )
    np.testing.assert_allclose(out.chi, chi0, rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(out.err), np.asarray(err0))

    # Cross-formulation check vs the coefficient-field backend: the
    # integer-grid constrained bicubic is mathematically equal but
    # numerically a different route (~1e-4 relative agreement).
    field = precompute_field(jnp.asarray(dfm), interp)
    a1, b1, chi1, err1 = assemble_normal_equations(
        model, interp, field, jnp.asarray(und_w),
        jnp.asarray(xy), jnp.asarray(mask), jnp.asarray(center),
        jnp.asarray(params),
    )
    np.testing.assert_allclose(
        out.a_mat, a1, rtol=5e-3, atol=np.abs(np.asarray(a1)).max() * 2e-5
    )
    np.testing.assert_allclose(
        out.b_vec, b1, rtol=5e-3, atol=np.abs(np.asarray(b1)).max() * 5e-5
    )
    np.testing.assert_allclose(out.chi, chi1, rtol=5e-4)
    np.testing.assert_array_equal(np.asarray(out.err), np.asarray(err1))


def test_out_of_image_flagged():
    model, interp = FittingModel.UV, Interpolation.BICUBIC
    und, dfm, xy, mask, center, und_w, _ = _problem(model, interp, s=2)
    params = np.array([[0.0, 0.0], [400.0, 0.0]], np.float32)
    out = _run_v2(model, interp, dfm, xy, mask, center, und_w, params)
    assert not bool(out.err[0])
    assert bool(out.err[1])


@pytest.mark.parametrize("channels", [1, 3])
def test_engine_pallas_backend_translation_recovery(channels):
    """Full engine solve through the Pallas backend (interpret mode)."""
    spk = Speckle(64, 64, seed=21)
    true_u, true_v = 1.37, -0.58
    und = spk.image()
    dfm = spk.warped_image(u=true_u, v=true_v)
    if channels > 1:
        und = np.stack([und * f for f in (1.0, 0.8, 0.6)], -1)
        dfm = np.stack([dfm * f for f in (1.0, 0.8, 0.6)], -1)
    else:
        und = und[..., None]
        dfm = dfm[..., None]
    cfg = SolverConfig(
        model=FittingModel.UV,
        interpolation=Interpolation.BICUBIC,
        pyramid=PyramidConfig(0, 1, 0),
        precision=1e-6,
        backend="pallas",
    )
    pts = np.stack(
        np.meshgrid(np.arange(20, 45), np.arange(20, 45), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2).astype(np.float32)
    batch = make_batch([pts], None, 0)
    res = correlate(
        cfg,
        [jnp.asarray(und)],
        [jnp.asarray(dfm)],
        batch,
        np.zeros((1, 2), np.float32),
    )
    assert int(res.error[0]) == 0
    np.testing.assert_allclose(
        np.asarray(res.params)[0], [true_u, true_v], atol=2e-3
    )


def test_engine_pallas_backend_under_mesh(monkeypatch):
    """backend='pallas' under a mesh runs via shard_map (VERDICT item 4)."""
    from correlation_tpu.parallel.mesh import make_mesh

    # Force identical kernel configs on both runs: a 1-subset-per-device
    # mesh shard cannot lane-pack, while the 4-subset single-device run
    # would (group=2) — different tiles mean f32-rounding differences
    # that can flip iteration counts at precision=1e-6.
    monkeypatch.setenv("CORRTPU_GROUP", "1")

    spk = Speckle(72, 72, seed=3)
    true_u, true_v = 0.8, -0.3
    und = spk.image()[..., None]
    dfm = spk.warped_image(u=true_u, v=true_v)[..., None]
    cfg = SolverConfig(
        model=FittingModel.UV,
        interpolation=Interpolation.BICUBIC,
        pyramid=PyramidConfig(0, 1, 0),
        precision=1e-6,
        backend="pallas",
    )
    pts = []
    for cy in (24, 40):
        for cx in (24, 40):
            gx, gy = np.meshgrid(
                np.arange(cx - 6, cx + 7), np.arange(cy - 6, cy + 7),
                indexing="ij",
            )
            pts.append(
                np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
            )
    batch = make_batch(pts, None, 0)
    mesh = make_mesh()
    res = correlate(
        cfg,
        [jnp.asarray(und)],
        [jnp.asarray(dfm)],
        batch,
        np.zeros((4, 2), np.float32),
        mesh=mesh,
    )
    res_single = correlate(
        cfg,
        [jnp.asarray(und)],
        [jnp.asarray(dfm)],
        batch,
        np.zeros((4, 2), np.float32),
    )
    assert res.params.shape[0] == 4
    np.testing.assert_array_equal(np.asarray(res.error), 0)
    # The sharded program runs the same kernel per shard.  The per-shard
    # subset count changes the kernel block size, and the block-batched
    # Gram matmul may reassociate its lane-chunk accumulation differently
    # per block shape — so agreement is f32-rounding-tight, not bit-exact.
    np.testing.assert_allclose(
        np.asarray(res.params), np.asarray(res_single.params),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(res.iterations), np.asarray(res_single.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(res.params),
        np.tile([[true_u, true_v]], (4, 1)),
        atol=2e-2,
    )


def test_lane_packed_groups_match_ungrouped():
    """Lane packing (group=G subsets per kernel unit) must reproduce the
    ungrouped assembly: the packed Gram rows are zero outside each
    subset's lane block, so every cross-group contribution is exactly
    zero."""
    model, interp = FittingModel.AFFINE, Interpolation.BICUBIC
    spk = Speckle(96, 160, seed=12)
    dfm = np.floor(spk.warped_image(u=0.7, v=-0.4))[..., None]
    s, side = 8, 9
    xy = np.zeros((s, side * side, 2), np.float32)
    for i in range(s):
        cx, cy = 16 + 14 * (i % 4), 24 + 30 * (i // 4)
        gx, gy = np.meshgrid(
            np.arange(cx, cx + side), np.arange(cy, cy + side),
            indexing="ij",
        )
        xy[i] = np.stack([gx.ravel(), gy.ravel()], -1)
    mask = np.ones((s, side * side), bool)
    mask[:, -5:] = False
    center = xy.mean(axis=1).astype(np.float32)
    und_w = dfm[xy[..., 1].astype(int), xy[..., 0].astype(int), 0][..., None]
    rng = np.random.default_rng(3)
    params = rng.normal(0, 0.01, (s, 6)).astype(np.float32)
    params[:, 0] += 0.4

    h, w = dfm.shape[0], dfm.shape[1]
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    bbox = v2.subset_bbox(jnp.asarray(xy), jnp.asarray(mask))

    # ungrouped reference
    th1, tw1 = v2.choose_tile(9, 9, hp, wp)
    pix1 = v2.pack_pixdata(
        jnp.asarray(xy), jnp.asarray(mask), jnp.asarray(und_w),
        jnp.asarray(center),
    )
    ref = v2.fused_assemble(
        model, interp, th1, tw1, h, w, jnp.asarray(dfm), pix1,
        jnp.asarray(center), jnp.asarray(params), bbox, 4,
    )

    # packed: groups of 4 consecutive subsets (same image row, compact)
    th4, tw4 = v2.choose_tile(9, 14 * 3 + 9, hp, wp)
    pix4 = v2.pack_pixdata(
        jnp.asarray(xy), jnp.asarray(mask), jnp.asarray(und_w),
        jnp.asarray(center), group=4,
    )
    out = v2.fused_assemble(
        model, interp, th4, tw4, h, w, jnp.asarray(dfm), pix4,
        jnp.asarray(center), jnp.asarray(params), bbox, 2, group=4,
    )
    # Different (union vs per-subset) tiles reassociate the f32 Gram
    # accumulation: agreement is rounding-tight, not bit-exact.
    np.testing.assert_allclose(out.a_mat, ref.a_mat, rtol=2e-4, atol=1e-2)
    np.testing.assert_allclose(out.b_vec, ref.b_vec, rtol=2e-4, atol=1e-1)
    np.testing.assert_allclose(out.chi, ref.chi, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.err), np.asarray(ref.err))


def test_tight_lane_packing_matches_legacy():
    """Tight packing (p_sub = 8-lane per-subset quota) must reproduce the
    legacy one-subset-per-128-lane layout: same per-subset A/b/chi/err."""
    import jax.numpy as jnp

    from correlation_tpu.config import FittingModel, Interpolation
    from correlation_tpu.ops import assemble_v2 as v2
    from correlation_tpu.ops.interp import sample_integer

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        np.floor(rng.uniform(0, 255, (200, 400, 1))).astype(np.float32)
    )
    pts, ctr = [], []
    for r in range(4):
        for c in range(12):
            cx, cy = 20 + 8 * c, 30 + 24 * r
            gx, gy = np.meshgrid(
                np.arange(cx - 3, cx + 4), np.arange(cy - 3, cy + 4),
                indexing="ij",
            )
            pts.append(np.stack([gx.ravel(), gy.ravel()], -1))
            ctr.append((cx, cy))
    xy = jnp.asarray(np.stack(pts).astype(np.float32))
    mask = jnp.ones((48, 49), bool)
    center = jnp.asarray(np.array(ctr, np.float32))
    params = jnp.asarray(rng.normal(0, 0.02, (48, 6)).astype(np.float32))
    und_w = sample_integer(img, xy) * mask[..., None]
    bbox = v2.subset_bbox(xy, mask)
    ref = v2.fused_assemble(
        FittingModel.AFFINE, Interpolation.BICUBIC, 24, 24, 200, 400, img,
        v2.pack_pixdata(xy, mask, und_w, center), center, params, bbox, 8,
        interpret=True,
    )
    assert not bool(np.asarray(ref.err).any())
    for g, tw, quota in ((2, 32, 56), (3, 40, 56), (6, 64, 56)):
        pix = v2.pack_pixdata(
            xy, mask, und_w, center, group=g, p_sub=quota
        )
        assert pix.shape[-1] % 128 == 0
        o = v2.fused_assemble(
            FittingModel.AFFINE, Interpolation.BICUBIC, tw, tw, 200, 400,
            img, pix, center, params, bbox, 8,
            interpret=True, group=g, p_sub=quota,
        )
        scale = float(jnp.max(jnp.abs(ref.a_mat)))
        np.testing.assert_allclose(
            np.asarray(o.a_mat), np.asarray(ref.a_mat),
            atol=2e-6 * scale,
        )
        np.testing.assert_allclose(
            np.asarray(o.chi), np.asarray(ref.chi), rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(o.err), np.asarray(ref.err)
        )
