import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from correlation_tpu.config import FittingModel, Interpolation
from correlation_tpu.ops.assemble import assemble_normal_equations
from correlation_tpu.ops.interp import precompute_field, sample_integer
from synthetic import Speckle

CASES = [
    (FittingModel.UV, Interpolation.BICUBIC, "UV", "bicubic"),
    (FittingModel.AFFINE, Interpolation.BICUBIC, "AFFINE", "bicubic"),
    (FittingModel.UVQ, Interpolation.BILINEAR, "UVQ", "bilinear"),
    (FittingModel.U, Interpolation.NEAREST, "U", "nearest"),
]


@pytest.mark.parametrize("model,interp,omodel,ointerp", CASES)
def test_assembly_matches_oracle(model, interp, omodel, ointerp):
    spk = Speckle(40, 44, seed=11)
    und = np.floor(spk.image()).astype(np.float64)
    dfm = np.floor(spk.warped_image(u=0.4, v=-0.3)).astype(np.float64)

    # two subsets: an 11x9 grid and a 7x7 grid (padded batch)
    pts1 = np.stack(
        np.meshgrid(np.arange(10, 21), np.arange(12, 21), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2).astype(np.float32)
    pts2 = np.stack(
        np.meshgrid(np.arange(22, 29), np.arange(20, 27), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2).astype(np.float32)

    p_max = len(pts1)
    xy = np.zeros((2, p_max, 2), np.float32)
    mask = np.zeros((2, p_max), bool)
    xy[0] = pts1
    mask[0] = True
    xy[1, : len(pts2)] = pts2
    mask[1, : len(pts2)] = True
    centers = np.stack([pts1.mean(axis=0), pts2.mean(axis=0)]).astype(
        np.float32
    )

    num_p = oracle.NP_OF[omodel]
    rng = np.random.default_rng(2)
    params = rng.normal(0, 0.05, (2, num_p)).astype(np.float32)
    params[:, 0] += 0.4
    if num_p >= 2:
        params[:, 1] -= 0.3

    field = precompute_field(jnp.asarray(dfm[..., None], jnp.float32), interp)
    und_j = jnp.asarray(und[..., None], jnp.float32)
    und_w = sample_integer(und_j, jnp.asarray(xy)) * jnp.asarray(
        mask[..., None]
    )
    a_mat, b_vec, chi, err = assemble_normal_equations(
        model,
        interp,
        field,
        und_w,
        jnp.asarray(xy),
        jnp.asarray(mask),
        jnp.asarray(centers),
        jnp.asarray(params),
    )

    for s, pts in enumerate([pts1, pts2]):
        oa, ob, ochi, oerr = oracle.assemble(
            omodel,
            ointerp,
            und,
            dfm,
            pts,
            centers[s, 0],
            centers[s, 1],
            params[s].astype(np.float64),
        )
        assert not oerr
        assert not bool(err[s])
        np.testing.assert_allclose(np.asarray(chi)[s], ochi, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(b_vec)[s], ob, rtol=2e-4,
                                   atol=1e-2)
        np.testing.assert_allclose(np.asarray(a_mat)[s], oa, rtol=2e-4,
                                   atol=1e-2)


def test_out_of_image_sets_error():
    spk = Speckle(30, 30, seed=12)
    und = spk.image(quantize=True)
    dfm = spk.image(quantize=True)
    pts = np.stack(
        np.meshgrid(np.arange(2, 9), np.arange(2, 9), indexing="ij"), axis=-1
    ).reshape(-1, 2).astype(np.float32)
    xy = pts[None]
    mask = np.ones((1, len(pts)), bool)
    center = pts.mean(axis=0)[None]
    field = precompute_field(
        jnp.asarray(dfm[..., None]), Interpolation.BICUBIC
    )
    und_w = sample_integer(jnp.asarray(und[..., None]), jnp.asarray(xy))
    # huge translation pushes samples outside the image
    params = np.array([[500.0, 0.0]], np.float32)
    *_, err = assemble_normal_equations(
        FittingModel.UV,
        Interpolation.BICUBIC,
        field,
        und_w,
        jnp.asarray(xy),
        jnp.asarray(mask),
        jnp.asarray(center),
        jnp.asarray(params),
    )
    assert bool(err[0])
