"""Fused-assembly Pallas kernel vs the XLA reference path.

Runs in Pallas interpret mode so it executes on the CPU test mesh; the same
code compiles to Mosaic on real TPU.
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
from correlation_tpu.engine import (
    LevelStatic,
    compute_level_statics,
    correlate,
)
from correlation_tpu.ops import pallas_kernels as pk
from correlation_tpu.ops.assemble import assemble_normal_equations
from correlation_tpu.ops.interp import precompute_field, sample_integer
from synthetic import Speckle


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pk.pl, "pallas_call", patched)
    # static-arg jit caches must not leak compiled (non-interpret) versions
    pk.fused_assemble.clear_cache()
    pk.fused_assemble_tiles.clear_cache()
    yield
    pk.fused_assemble.clear_cache()
    pk.fused_assemble_tiles.clear_cache()


def _problem(model, interp, s=5, side=11):
    spk = Speckle(96, 130, seed=9)
    und = np.floor(spk.image())
    dfm = np.floor(spk.warped_image(u=0.7, v=-0.4))
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
    und_w = und[xy[..., 1].astype(int), xy[..., 0].astype(int)].astype(
        np.float32
    )
    rng = np.random.default_rng(4)
    num_p = {FittingModel.U: 1, FittingModel.UV: 2, FittingModel.UVQ: 3,
             FittingModel.AFFINE: 6}[model]
    params = rng.normal(0, 0.01, (s, num_p)).astype(np.float32)
    params[:, 0] += 0.7
    if num_p > 1:
        params[:, 1] -= 0.4
    return und, dfm, xy, mask, center, und_w, params


@pytest.mark.parametrize("use_dma", [False, True])
@pytest.mark.parametrize(
    "model,interp",
    [
        (FittingModel.AFFINE, Interpolation.BICUBIC),
        (FittingModel.UV, Interpolation.BILINEAR),
        (FittingModel.UVQ, Interpolation.BICUBIC),
        (FittingModel.U, Interpolation.NEAREST),
    ],
)
def test_fused_assembly_matches_xla(model, interp, use_dma):
    und, dfm, xy, mask, center, und_w, params = _problem(model, interp)
    h, w = dfm.shape
    imgp = pk.pad_image_for_dma(jnp.asarray(dfm))
    pix = pk.pack_pixdata(
        jnp.asarray(xy), jnp.asarray(mask), jnp.asarray(und_w),
        jnp.asarray(center),
    )
    mins = xy.min(axis=1)
    maxs = xy.max(axis=1)
    bbox = np.stack(
        [mins, np.stack([mins[:, 0], maxs[:, 1]], -1),
         np.stack([maxs[:, 0], mins[:, 1]], -1), maxs], 1,
    )
    ext = int(np.ceil((maxs - mins).max()))
    th, tw = pk.choose_tile(
        ext, ext, imgp.shape[0], imgp.shape[1], for_dma=use_dma
    )
    org = pk.compute_origins(
        model, interp, jnp.asarray(bbox), jnp.asarray(center),
        jnp.asarray(params), imgp.shape[0], imgp.shape[1], th, tw,
        align=use_dma,
    )
    fn = pk.fused_assemble if use_dma else pk.fused_assemble_tiles
    out = fn(model, interp, th, tw, h, w, imgp, pix, jnp.asarray(params),
             org)

    field = precompute_field(jnp.asarray(dfm)[..., None], interp)
    a1, b1, chi1, err1 = assemble_normal_equations(
        model, interp, field, jnp.asarray(und_w[..., None]),
        jnp.asarray(xy), jnp.asarray(mask), jnp.asarray(center),
        jnp.asarray(params),
    )
    np.testing.assert_allclose(
        out.a_mat, a1, rtol=5e-3, atol=np.abs(np.asarray(a1)).max() * 2e-5
    )
    np.testing.assert_allclose(
        out.b_vec, b1, rtol=5e-3, atol=np.abs(np.asarray(b1)).max() * 5e-5
    )
    np.testing.assert_allclose(out.chi, chi1, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.err), np.asarray(err1))


def test_out_of_image_flagged():
    model, interp = FittingModel.UV, Interpolation.BICUBIC
    und, dfm, xy, mask, center, und_w, _ = _problem(model, interp, s=2)
    params = np.array([[0.0, 0.0], [400.0, 0.0]], np.float32)
    h, w = dfm.shape
    imgp = pk.pad_image_for_dma(jnp.asarray(dfm))
    pix = pk.pack_pixdata(
        jnp.asarray(xy), jnp.asarray(mask), jnp.asarray(und_w),
        jnp.asarray(center),
    )
    mins = xy.min(axis=1)
    maxs = xy.max(axis=1)
    bbox = np.stack(
        [mins, np.stack([mins[:, 0], maxs[:, 1]], -1),
         np.stack([maxs[:, 0], mins[:, 1]], -1), maxs], 1,
    )
    th, tw = pk.choose_tile(11, 11, imgp.shape[0], imgp.shape[1])
    org = pk.compute_origins(
        model, interp, jnp.asarray(bbox), jnp.asarray(center),
        jnp.asarray(params), imgp.shape[0], imgp.shape[1], th, tw,
        align=False,
    )
    out = pk.fused_assemble_tiles(
        model, interp, th, tw, h, w, imgp, pix, jnp.asarray(params), org
    )
    assert not bool(out.err[0])
    assert bool(out.err[1])


def test_engine_pallas_backend_translation_recovery():
    """Full engine solve through the Pallas backend (interpret mode)."""
    spk = Speckle(64, 64, seed=21)
    true_u, true_v = 1.37, -0.58
    und = spk.image()
    dfm = spk.warped_image(u=true_u, v=true_v)
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
        [jnp.asarray(und[..., None])],
        [jnp.asarray(dfm[..., None])],
        batch,
        np.zeros((1, 2), np.float32),
    )
    assert int(res.error[0]) == 0
    np.testing.assert_allclose(
        np.asarray(res.params)[0], [true_u, true_v], atol=2e-3
    )
