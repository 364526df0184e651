"""Hardware parity of the round-4 kernel modes.

Round 4 added: VMEM-resident tile sources ("vmem" = MXU one-hot shift
realignment, "vmem_roll" = dynamic rolls), the batched row-selection
dot_general, the per-unit batched Gram ("unit"), the fixed "mask" Gram
fold, and a block=4 minimum-block path.  Each must agree with the
round-3 baseline configuration (DMA tiles + looped selection + "slice"
Gram) on real hardware.  A CPU-only run skips visibly (conftest).
"""

import numpy as np
import pytest

from correlation_tpu.config import FittingModel, Interpolation
from test_dma_parity import _problem, _run

MODEL, INTERP = FittingModel.AFFINE, Interpolation.BICUBIC


def _baseline(prob, tile_parts):
    return _run(
        MODEL, INTERP, *prob, in_kernel_dma=True, tile_parts=tile_parts,
        tile_src="dma", sel_mode="loop", gram_mode="slice",
    )


@pytest.mark.parametrize("tile_src", ["vmem", "vmem_roll"])
@pytest.mark.parametrize("tile_parts", [1, 3])
def test_vmem_tile_sources_bitexact(tile_src, tile_parts):
    """VMEM-resident tiles (direct slices; x realigned by a bf16 one-hot
    shift matmul or a dynamic roll) must be BIT-EXACT vs the DMA path —
    identical values reach the identical body."""
    prob = _problem(MODEL, 1)
    ref = _baseline(prob, tile_parts)
    got = _run(
        MODEL, INTERP, *prob, in_kernel_dma=True, tile_parts=tile_parts,
        tile_src=tile_src, sel_mode="loop", gram_mode="slice",
    )
    for a, b, name in zip(got, ref, ["A", "b", "chi", "err"]):
        np.testing.assert_array_equal(a, b, err_msg=f"{name} differs")


def test_batched_selection_bitexact():
    """One batched dot_general vs one dot per unit: same contraction per
    subset, so bit-exact."""
    prob = _problem(MODEL, 1)
    ref = _baseline(prob, 1)
    got = _run(
        MODEL, INTERP, *prob, in_kernel_dma=True, tile_parts=1,
        tile_src="dma", sel_mode="batched", gram_mode="slice",
    )
    for a, b, name in zip(got, ref, ["A", "b", "chi", "err"]):
        np.testing.assert_array_equal(a, b, err_msg=f"{name} differs")


@pytest.mark.parametrize("gram_mode", ["unit", "mask", "subset"])
def test_gram_modes_agree(gram_mode):
    """Gram reductions differ only in contraction shape/association; the
    f32 results must agree to f32-rounding tolerance (and usually
    bit-exactly) with the block-batched "slice" product."""
    prob = _problem(MODEL, 1)
    ref = _baseline(prob, 1)
    got = _run(
        MODEL, INTERP, *prob, in_kernel_dma=True, tile_parts=1,
        tile_src="dma", sel_mode="loop", gram_mode=gram_mode,
    )
    scale = max(np.abs(ref[0]).max(), 1.0)
    np.testing.assert_allclose(got[0], ref[0], atol=2e-5 * scale)
    np.testing.assert_allclose(
        got[2], ref[2], rtol=3e-5, atol=1e-2
    )
    np.testing.assert_array_equal(got[3], ref[3])


def test_block4_path_compiles_and_matches():
    """A sub-8 block request on a multi-step grid violates Mosaic's
    sublane-divisibility rule; fused_assemble must round it up to a legal
    block and still match block=8 bit-exactly (ADVICE r3)."""
    prob = _problem(MODEL, 1)
    ref = _run(
        MODEL, INTERP, *prob, in_kernel_dma=True, tile_parts=1, block=8,
    )
    got = _run(
        MODEL, INTERP, *prob, in_kernel_dma=True, tile_parts=1, block=4,
    )
    for a, b, name in zip(got, ref, ["A", "b", "chi", "err"]):
        np.testing.assert_array_equal(a, b, err_msg=f"{name} differs")


def test_default_auto_config_matches_r3_baseline():
    """The shipped defaults (auto tile source resolving to vmem, batched
    selection, unit Gram) vs the full round-3 configuration."""
    prob = _problem(MODEL, 1)
    ref = _baseline(prob, 1)
    got = _run(
        MODEL, INTERP, *prob, in_kernel_dma=True, tile_parts=1,
        tile_src="auto",
    )
    scale = max(np.abs(ref[0]).max(), 1.0)
    np.testing.assert_allclose(got[0], ref[0], atol=2e-5 * scale)
    np.testing.assert_array_equal(got[3], ref[3])


def test_tight_packing_on_hardware():
    """Tight lane packing (8-lane per-subset quotas) vs the legacy layout
    on real TPU: ragged-quota one-hots, dead tail lanes, and per-group
    Gram extraction must all lower correctly through Mosaic."""
    import jax.numpy as jnp

    from correlation_tpu.ops import assemble_v2 as v2
    from correlation_tpu.ops.interp import sample_integer

    rng = np.random.default_rng(3)
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
        MODEL, INTERP, 24, 24, 200, 400, img,
        v2.pack_pixdata(xy, mask, und_w, center), center, params, bbox, 8,
        tile_parts=1,
    )
    assert not bool(np.asarray(ref.err).any())
    for g, tw, ts in (
        (3, 40, "vmem"), (6, 64, "vmem"), (3, 40, "dma"), (6, 64, "dma"),
    ):
        pix = v2.pack_pixdata(xy, mask, und_w, center, group=g, p_sub=56)
        o = v2.fused_assemble(
            MODEL, INTERP, tw, tw, 200, 400, img, pix, center, params,
            bbox, 8, tile_parts=1, group=g, p_sub=56, tile_src=ts,
        )
        scale = float(np.abs(np.asarray(ref.a_mat)).max())
        np.testing.assert_allclose(
            np.asarray(o.a_mat), np.asarray(ref.a_mat),
            atol=2e-6 * scale, err_msg=f"g={g} tile_src={ts}",
        )
        np.testing.assert_array_equal(
            np.asarray(o.err), np.asarray(ref.err)
        )


def test_chunked_float_frames_match_per_frame_hw():
    """ADVICE r4: a chunked sequence whose LATER frames are float-valued
    must not keep sampling them through the parts=1 (bf16) selection the
    integer base frame earned — the stage() guard demotes the statics.
    On hardware, parity with the per-frame driver (which re-probes
    integrality every frame) is the end-to-end proof."""
    import numpy as np

    from correlation_tpu.config import (
        DeformationDescription,
        FittingModel,
        Interpolation,
        PyramidConfig,
        ReferenceImage,
        SolverConfig,
    )
    from correlation_tpu.sequence import SequenceConfig, run_sequence
    from synthetic import Speckle

    spk = Speckle(128, 128, seed=55)
    f0 = spk.image(quantize=True)[..., None]  # integer base frame
    frames = [f0] + [
        spk.warped_image(u=0.45 * t, v=-0.3 * t)[..., None]  # floats
        for t in range(1, 5)
    ]
    assert float(np.floor(frames[1]).sum()) != float(frames[1].sum())

    gx, gy = np.meshgrid(np.arange(30, 60), np.arange(30, 60),
                         indexing="ij")
    pts = [np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)]
    base = dict(
        deformation=DeformationDescription.EULERIAN,
        reference=ReferenceImage.FIRST,
    )
    solver = SolverConfig(
        model=FittingModel.UV,
        interpolation=Interpolation.BICUBIC,
        pyramid=PyramidConfig(0, 1, 1),
        precision=1e-6,
    )
    rc = run_sequence(
        frames, pts, SequenceConfig(solver=solver, frame_chunk=2, **base)
    )
    rp = run_sequence(
        frames, pts, SequenceConfig(solver=solver, frame_chunk=1, **base)
    )
    for a, b in zip(rc, rp):
        np.testing.assert_array_equal(a.error, b.error)
        np.testing.assert_allclose(a.params, b.params, atol=1e-4)
