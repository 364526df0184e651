"""Fused Pallas assembly v2 — MXU one-hot row selection, lane-major pixels.

The TPU-native replacement for the reference's fused CUDA kernel
`kCorrelation` (correlationKernel.cu:122-268) and its tree reduction
(kernels.cu:56-103).  One grid step processes a block of B subsets:

  1. Each subset's deformed-image tile (pre-extracted by XLA with one
     dynamic_slice from the warped bounding box, TRANSPOSED so image rows
     are the lane axis) sits in VMEM.
  2. Warp the subset pixels (VPU) — forward-additive, per fitting model
     (model_class.cpp:48-202).
  3. **Row selection as an exact bf16 MXU matmul.**  The separable form of
     the reference's finite-difference-constrained bicubic (== Catmull-Rom
     cubic convolution; verified in tests) needs, per pixel, the `taps`
     tile rows around its warped y.  Key trick: build a one-hot matrix
     O[r, p] = (r == row(p)); its entries (0/1) are EXACT in bfloat16, so
     `sel = wide @ O` is a pure row-gather executed on the MXU at full
     bf16 rate with zero arithmetic error in the selection itself.  The
     f32 tile is split hi/mid/lo into three bf16 parts (x = b1 + b2 + b3
     reconstructs all f32 mantissa bits) and the three products fuse into
     ONE matmul by stacking the parts along the contraction axis:
     [hi|mid|lo] @ [O; O; O].  The tile is pre-shifted into `taps`
     row-offset copies so one matmul yields the whole y-neighborhood.
  4. Every per-pixel stage runs with the PIXEL axis on the VPU lane axis
     and the B subsets (x tap rows) stacked on sublanes — a handful of
     large [B, taps*tw, P] ops instead of thousands of [P, 1] ops (TPU
     vector ops are issue-bound at small shapes; this layout is what makes
     the kernel fast): cubic tap weights (Horner), the tap-row
     combination, a scattered column-weight build, and three
     multiply-reduce contractions for w, dw/dx, dw/dy.
  5. G^T = [H | V | bad] rows per color; the normal equations reduce with
     one [8, 8] Gram matmul per subset — A, b, chi = slices of G^T G — the
     analog of the CUDA shared-memory block reduction.

No HBM materialization of per-pixel weight rows (the XLA backend's
bottleneck): everything between the streamed inputs and the [8, 8] output
lives in VMEM.

Out-of-image validity windows follow the reference exactly
(interpolation_class.cpp:82-83,143-144,200-201); a pixel whose stencil
leaves its tile is flagged the same way (tiles are sized with warp margin
so that only happens for warps about to leave the image).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correlation_tpu.config import FittingModel, Interpolation

# pixdata row layout ([S, 8, P_pad] f32 — pixels on the LANE axis)
_ROW_X = 0
_ROW_Y = 1
_ROW_MASK = 2
_ROW_DXC = 3  # x - center_x
_ROW_DYC = 4  # y - center_y
_ROW_UND = 5  # und intensities, rows 5..5+C (C <= 3)


class FusedAssembly(NamedTuple):
    a_mat: jax.Array  # [S, NP, NP]
    b_vec: jax.Array  # [S, NP]
    chi: jax.Array  # [S]
    err: jax.Array  # [S] bool
    # Flat view of the raw [S, 8, 8] kernel output ([S, 64]; element
    # (i, j) at column 8i+j, b at 8i+NP, chi at 9*NP, err flag at
    # 9*(NP+1)).  The LM engine consumes THIS (transposed to element-major
    # rows): the a_mat/b_vec/chi/err field extractions above each
    # re-read the (8, 128)-padded 16 MB output buffer per iteration,
    # while one reshape pass compacts it 8x first.  Unused fields are
    # DCE'd under jit, so both access styles stay free.
    flat: jax.Array | None = None


def _cubic_taps(t):
    """Catmull-Rom value and derivative taps at offsets -1..2 (Horner).

    Equals the reference's finite-difference-constrained bicubic
    (interpolation_class.cpp:296-321,539-558) in separable form.
    """
    k = (
        ((-0.5 * t + 1.0) * t - 0.5) * t,
        (1.5 * t - 2.5) * t * t + 1.0,
        ((-1.5 * t + 2.0) * t + 0.5) * t,
        (0.5 * t - 0.5) * t * t,
    )
    dk = (
        (-1.5 * t + 2.0) * t - 0.5,
        (4.5 * t - 5.0) * t,
        (-4.5 * t + 4.0) * t + 0.5,
        (1.5 * t - 1.0) * t,
    )
    return k, dk


def _interp_taps(interp: Interpolation, tx, ty, xd, yd, img_h, img_w):
    """Tap weights + validity window per interpolation model.

    Windows replicate interpolation_class.cpp:82-83 (bicubic), :143-144
    (bilinear), :200-201 (nearest).  Tap tuples are [B, P]-shaped.
    """
    if interp == Interpolation.BICUBIC:
        valid = (xd > 1.0) & (yd > 1.0) & (xd < img_w - 2.0) & (yd < img_h - 2.0)
        kx, dkx = _cubic_taps(tx)
        ky, dky = _cubic_taps(ty)
        return 4, 1, valid, kx, dkx, ky, dky
    one_x = jnp.ones_like(tx)
    one_y = jnp.ones_like(ty)
    valid = (xd > 0.0) & (yd > 0.0) & (xd < img_w - 1.0) & (yd < img_h - 1.0)
    if interp == Interpolation.BILINEAR:
        kx = (1.0 - tx, tx)
        ky = (1.0 - ty, ty)
    else:  # NEAREST: value at rounded pixel, forward-difference gradients
        kx = (one_x, jnp.zeros_like(tx))
        ky = (one_y, jnp.zeros_like(ty))
    dkx = (-one_x, one_x)
    dky = (-one_y, one_y)
    return 2, 0, valid, kx, dkx, ky, dky


def _warp(model: FittingModel, p, x, y, dxc, dyc):
    """Forward-additive warp (model_class.cpp:48-202); p[k] broadcasts."""
    if model == FittingModel.U:
        return x + p[0], y
    if model == FittingModel.UV:
        return x + p[0], y + p[1]
    if model == FittingModel.UVQ:
        return x + p[0] - p[2] * dyc, y + p[1] + p[2] * dxc
    if model == FittingModel.AFFINE:
        return (
            x + p[0] + p[2] * dxc + p[3] * dyc,
            y + p[1] + p[4] * dxc + p[5] * dyc,
        )
    raise ValueError(f"unknown model {model}")


def _h_rows(model: FittingModel, dwdx, dwdy, dxc, dyc):
    """Steepest-descent rows (interpolation_class.cpp:728-739)."""
    if model == FittingModel.U:
        return [dwdx]
    if model == FittingModel.UV:
        return [dwdx, dwdy]
    if model == FittingModel.UVQ:
        return [dwdx, dwdy, -dwdx * dyc + dwdy * dxc]
    if model == FittingModel.AFFINE:
        return [dwdx, dwdy, dwdx * dxc, dwdx * dyc, dwdy * dxc, dwdy * dyc]
    raise ValueError(f"unknown model {model}")


def _split3_bf16(x):
    """Split f32 into three bf16 parts with x == b1 + b2 + b3 to f32
    precision (each part captures the next 8 mantissa bits)."""
    b1 = x.astype(jnp.bfloat16)
    r1 = x - b1.astype(jnp.float32)
    b2 = r1.astype(jnp.bfloat16)
    r2 = r1 - b2.astype(jnp.float32)
    b3 = r2.astype(jnp.bfloat16)
    return b1, b2, b3


def _make_kernel(
    model: FittingModel,
    interp: Interpolation,
    img_h: int,
    img_w: int,
    tile_h: int,
    tile_w: int,
    channels: int,
    block: int,
    p_pad: int,
    dma_w: int = 0,
    tile_parts: int = 3,
    gram_mode: str = "unit",
    row_slack: bool = False,
    th_fetch: int = 0,
    group: int = 1,
    sel_mode: str = "batched",
    tile_src: str = "dma",
    ablate: str = "",
    p_sub: int = 0,
):
    """Build the Pallas kernel body for a block of `block` subsets.

    Refs: pixdata [B, 8, P], params [B, 8], origins [B, 2] (y0, x0),
    tiles [B, th, C*tw] (rows on sublanes; XLA-extracted), out [B, 8, 8],
    sel scratch [B, taps*C*tw, P] f32.

    With dma_w > 0 the tiles input is replaced by (org_smem [B, 2] SMEM,
    img [C, Hp, Wp] in ANY/HBM) and each grid step fetches its subsets'
    tiles itself: one aligned [tile_h, dma_w] async copy per subset per
    channel (DMA offsets must respect the (8, 128) HBM tiling), then a
    dynamic lane roll realigns x.  This kills the XLA vmap(dynamic_slice)
    tile gather — a serial 1-subset-at-a-time while loop that dominated
    the assembly cost (the kernel analog of the reference reading the
    deformed image through the texture cache, correlationKernel.cu:601-619).
    """
    f32 = jnp.float32
    taps = 4 if interp == Interpolation.BICUBIC else 2
    halo = 1 if interp == Interpolation.BICUBIC else 0
    w_all = channels * tile_w

    if dma_w:
        # Double-buffered in-kernel DMA: at grid step i the kernel first
        # issues step i+1's tile fetches (origins come from the
        # scalar-prefetch ref, so every step's addresses are known up
        # front), then waits only on step i's — the HBM->VMEM latency of a
        # whole block of tiles hides behind the previous block's compute.
        # Without this the kernel serializes issue->wait->compute per step
        # and runs latency-bound (~25us/step flat regardless of shape).

        def kernel_dma(org_all_ref, pixdata_ref, params_ref, org_ref,
                       img_ref, out_ref, sel_ref, raw_ref, sems):
            # org_all_ref: FLAT [2 * S_pad] int32 (y0, x0 interleaved) —
            # 1-D so the SMEM prefetch buffer stays compact (a 2-D minor
            # dim would pad to 128 and blow the 1MB SMEM budget).
            i = pl.program_id(0)
            nsteps = pl.num_programs(0)

            def issue(step, slot):
                base = step * block
                for b in range(block):
                    y0a = pl.multiple_of(
                        org_all_ref[2 * (base + b)] & ~7, 8
                    )
                    x0a = pl.multiple_of(
                        org_all_ref[2 * (base + b) + 1] & ~127, 128
                    )
                    for c in range(channels):
                        pltpu.make_async_copy(
                            img_ref.at[
                                c, pl.ds(y0a, th_fetch), pl.ds(x0a, dma_w)
                            ],
                            raw_ref.at[slot, b * channels + c],
                            sems.at[slot, b * channels + c],
                        ).start()

            @pl.when(i == 0)
            def _():
                issue(0, 0)

            @pl.when(i + 1 < nsteps)
            def _():
                issue(i + 1, (i + 1) % 2)

            slot = i % 2
            tiles = []
            for b in range(block):
                base = i * block
                y0 = org_all_ref[2 * (base + b)]
                x0 = org_all_ref[2 * (base + b) + 1]
                dy = y0 - (y0 & ~7)
                dx = x0 - (x0 & ~127)
                chans = []
                for c in range(channels):
                    pltpu.make_async_copy(
                        img_ref.at[c, pl.ds(0, th_fetch), pl.ds(0, dma_w)],
                        raw_ref.at[slot, b * channels + c],
                        sems.at[slot, b * channels + c],
                    ).wait()
                    # Realign: the DMA origin aligned down to the (8, 128)
                    # HBM tiling.  The lane roll restores exact x; rows are
                    # either rolled too (row_slack=False: the selection
                    # contracts over exactly tile_h rows) or left with the
                    # <=7 leading slack rows (row_slack=True: the body works
                    # on th_fetch rows with an aligned y origin — one fewer
                    # roll per subset at the price of 8 extra contraction
                    # rows).
                    rolled = pltpu.roll(
                        raw_ref[slot, b * channels + c], dma_w - dx, axis=1
                    )
                    if not row_slack:
                        rolled = pltpu.roll(rolled, th_fetch - dy, axis=0)
                    chans.append(rolled[:tile_h, :tile_w])
                tiles.append(
                    jnp.concatenate(chans, axis=1)
                    if channels > 1 else chans[0]
                )
            _body(pixdata_ref, params_ref, org_ref, jnp.stack(tiles),
                  out_ref, sel_ref)

        def kernel_vmem_roll(org_all_ref, pixdata_ref, params_ref, org_ref,
                             img_ref, out_ref, sel_ref):
            # Whole-level image RESIDENT in VMEM (fits for typical pyramid
            # levels; engine checks the budget): per-unit tiles are direct
            # aligned slices + a lane roll — the DMA issue/wait pair and
            # the per-assembly HBM re-fetch of ~dma_w/tile_w x the needed
            # bytes disappear entirely.  The analog of the reference's
            # texture-cache-resident reads (correlationKernel.cu:601-619)
            # with the whole level as the cache.
            i = pl.program_id(0)
            tiles = []
            for b in range(block):
                base = i * block
                y0 = org_all_ref[2 * (base + b)]
                x0 = org_all_ref[2 * (base + b) + 1]
                y0a = pl.multiple_of(y0 & ~7, 8)
                x0a = pl.multiple_of(x0 & ~127, 128)
                dy = y0 - y0a
                dx = x0 - x0a
                chans = []
                for c in range(channels):
                    raw = img_ref[
                        c, pl.ds(y0a, th_fetch), pl.ds(x0a, dma_w)
                    ]
                    rolled = pltpu.roll(raw, dma_w - dx, axis=1)
                    if not row_slack:
                        rolled = pltpu.roll(rolled, th_fetch - dy, axis=0)
                    chans.append(rolled[:tile_h, :tile_w])
                tiles.append(
                    jnp.concatenate(chans, axis=1)
                    if channels > 1 else chans[0]
                )
            _body(pixdata_ref, params_ref, org_ref, jnp.stack(tiles),
                  out_ref, sel_ref)

        def kernel_vmem(org_all_ref, pixdata_ref, params_ref, org_ref,
                        img_ref, out_ref, sel_ref):
            # VMEM-resident image + MXU realignment.  The per-unit serial
            # chain collapses to ONE aligned slice per unit/channel: the
            # x realignment (a dynamic lane roll everywhere else) is a
            # multiplication by a shifted-identity one-hot — 0/1, exact in
            # bf16 — batched over the whole block in a single dot_general;
            # the y offset is absorbed by the row-selection one-hot
            # (row_slack semantics: the body works on th_fetch rows from
            # the 8-aligned origin).  No DMA, no rolls, no per-unit matmul
            # issues.
            i = pl.program_id(0)
            raws = []
            for b in range(block):
                base = i * block
                y0 = org_all_ref[2 * (base + b)]
                x0 = org_all_ref[2 * (base + b) + 1]
                y0a = pl.multiple_of(y0 & ~7, 8)
                x0a = pl.multiple_of(x0 & ~127, 128)
                for c in range(channels):
                    raws.append(
                        img_ref[c, pl.ds(y0a, th_fetch), pl.ds(x0a, dma_w)]
                    )
            raw = jnp.stack(raws)  # [B*C, th_fetch, dma_w]
            if channels > 1:
                raw = raw.reshape(block, channels, th_fetch, dma_w)

            # Per-unit lane offset from the vector origins (org_ref holds
            # the aligned y0a and the EXACT x0; dx = x0 mod 128).
            dx = org_ref[:, 1] & 127  # [B] int32
            src = jax.lax.broadcasted_iota(
                jnp.int32, (block, dma_w, tile_w), 1
            )
            dst = jax.lax.broadcasted_iota(
                jnp.int32, (block, dma_w, tile_w), 2
            )
            shift = (src == dst + dx[:, None, None]).astype(jnp.bfloat16)
            exact_bf16 = tile_parts == 1

            def realign(r):  # [B, th_fetch, dma_w] -> [B, th_fetch, tw]
                lhs = r.astype(jnp.bfloat16) if exact_bf16 else r
                return jax.lax.dot_general(
                    lhs,
                    shift if exact_bf16 else shift.astype(f32),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )

            if channels > 1:
                tiles = jnp.concatenate(
                    [realign(raw[:, c]) for c in range(channels)], axis=2
                )
            else:
                tiles = realign(raw)
            _body(pixdata_ref, params_ref, org_ref, tiles,
                  out_ref, sel_ref)

    def kernel(pixdata_ref, params_ref, org_ref, tiles_ref, out_ref, sel_ref):
        _body(pixdata_ref, params_ref, org_ref, tiles_ref[:], out_ref, sel_ref)

    def _body(pixdata_ref, params_ref, org_ref, tiles, out_ref, sel_ref):
        # Ablation points (perf forensics only — experiments/ablate_v2.py):
        # truncate the kernel after a stage, writing a dependency-carrying
        # dummy so nothing gets DCE'd.
        if ablate == "stub":
            # Pipeline floor: input blocks still stream, body does nothing.
            out_ref[:] = jnp.full(
                (block * group, 8, 8),
                pixdata_ref[0, 0, 0] + params_ref[0, 0], f32,
            )
            return
        if ablate == "tiles_only":
            out_ref[:] = jnp.full(
                (block * group, 8, 8), jnp.sum(tiles), f32
            )
            return
        if ablate == "zero_tiles":
            tiles = jnp.zeros_like(tiles) + 1.0
        x = pixdata_ref[:, _ROW_X, :]  # [B, P]
        y = pixdata_ref[:, _ROW_Y, :]
        maskf = pixdata_ref[:, _ROW_MASK, :]
        dxc = pixdata_ref[:, _ROW_DXC, :]
        dyc = pixdata_ref[:, _ROW_DYC, :]

        if group == 1:
            gmasks = None
            p = [params_ref[:, k : k + 1] for k in range(6)]  # [B, 1] bcast
        else:
            # G packed subsets per unit: lane block g belongs to subset g
            # of the unit, with its own parameters.  p_sub is the
            # per-subset lane quota (tight packing: any multiple of 8;
            # lanes >= group*p_sub are dead tail).
            quota = p_sub if p_sub else p_pad // group
            glane = (
                jax.lax.broadcasted_iota(jnp.int32, (block, p_pad), 1)
                // quota
            )
            gmasks = [(glane == g).astype(f32) for g in range(group)]
            p = [
                sum(
                    gmasks[g] * params_ref[:, g * 8 + k : g * 8 + k + 1]
                    for g in range(group)
                )
                for k in range(6)
            ]
        xd, yd = _warp(model, p, x, y, dxc, dyc)

        ax = jnp.floor(xd)
        ay = jnp.floor(yd)
        tx = xd - ax
        ty = yd - ay
        taps_, _, valid, kx, dkx, ky, dky = _interp_taps(
            interp, tx, ty, xd, yd, img_h, img_w
        )
        if interp == Interpolation.NEAREST:
            ax = jnp.floor(xd + 0.5)
            ay = jnp.floor(yd + 0.5)
        x0 = org_ref[:, 1:2]  # [B, 1] int32
        y0 = org_ref[:, 0:1]
        rx = ax.astype(jnp.int32) - halo - x0  # [B, P]
        ry = ay.astype(jnp.int32) - halo - y0
        in_tile = (
            (rx >= 0) & (rx <= tile_w - taps) & (ry >= 0) & (ry <= tile_h - taps)
        )
        ok = (valid & in_tile).astype(f32)
        rx = jnp.clip(rx, 0, tile_w - taps)
        ry = jnp.clip(ry, 0, tile_h - taps)

        # ---- one-hot row matmuls (MXU), one per subset -------------------
        # wide[b, j*W + c] column block j holds tile rows shifted up by j:
        # wide[b, r, j*W + c] = tile[b, r + j, c].  Both operands contract
        # over their SUBLANE axis (tile rows), so tiles arrive untransposed.
        zrow = jnp.zeros((block, 1, w_all), f32)
        shifted = [tiles]
        for j in range(1, taps):
            shifted.append(
                jnp.concatenate([tiles[:, j:, :]] + [zrow] * j, axis=1)
            )
        wide = jnp.concatenate(shifted, axis=2)  # [B, th, taps*W]
        if tile_parts == 1:
            # Integer-valued images (uint8 pyramids, ops/pyramid.py): every
            # value 0..255 is EXACT in one bf16, so a single part suffices
            # and the contraction is tile_h deep instead of 3*tile_h.
            parts = wide.astype(jnp.bfloat16)
        else:
            b1, b2, b3 = _split3_bf16(wide)
            ps = [b1, b2, b3][:tile_parts]
            parts = jnp.concatenate(ps, axis=1)  # [B, parts*th, taps*W]

        # O[b, r, p] = (r == ry[b, p]), exact 0/1 in bf16.
        r_sub = jax.lax.broadcasted_iota(jnp.int32, (block, tile_h, p_pad), 1)
        onehot = (r_sub == ry[:, None, :]).astype(jnp.bfloat16)

        # sel[b, j*W + c, p] = tile[b, ry[b, p] + j, c], exact to f32 (one
        # part when integral; 8 bits of mantissa per extra part otherwise).
        # Integral images: the selected values are integers 0..255, exact
        # in bf16 — sel stores them at half the VMEM.
        if sel_mode in ("batched", "direct"):
            # One batched dot_general serves the whole block — Mosaic
            # lowers the batch dim natively, replacing `block` separate
            # matmul issues (plus their per-subset slice/concat chains).
            o3 = (
                jnp.concatenate([onehot] * tile_parts, axis=1)
                if tile_parts > 1
                else onehot
            )  # [B, parts*th, P]
            picked = jax.lax.dot_general(
                parts,
                o3,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            )  # [B, taps*W, P]
            sel_direct = picked if sel_mode == "direct" else None
            if sel_mode != "direct":
                sel_ref[:] = (
                    picked.astype(jnp.bfloat16)
                    if tile_parts == 1
                    else picked
                )
        else:  # "loop": one dot per subset
            sel_direct = None
            for b in range(block):
                o3 = (
                    jnp.concatenate([onehot[b]] * tile_parts, axis=0)
                    if tile_parts > 1
                    else onehot[b]
                )  # [parts*th, P]
                picked = jax.lax.dot_general(
                    parts[b],
                    o3,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )  # [taps*W, P]
                sel_ref[b] = (
                    picked.astype(jnp.bfloat16)
                    if tile_parts == 1
                    else picked
                )

        if ablate == "to_sel":
            probe = (
                sel_direct[0, :8, :128]
                if sel_direct is not None
                else sel_ref[0, :8, :128].astype(f32)
            )
            out_ref[:] = jnp.full(
                (block * group, 8, 8), jnp.sum(probe), f32
            )
            return

        # ---- tap-row combination (batched, lanes = pixels) ----------------
        sel = (
            sel_direct
            if sel_direct is not None
            else sel_ref[:].astype(f32)
        )  # [B, taps*W, P]
        tmp = ky[0][:, None, :] * sel[:, 0:w_all, :]
        tmp_d = dky[0][:, None, :] * sel[:, 0:w_all, :]
        for j in range(1, taps):
            chunk = sel[:, j * w_all : (j + 1) * w_all, :]
            tmp = tmp + ky[j][:, None, :] * chunk
            tmp_d = tmp_d + dky[j][:, None, :] * chunk
        # tmp[b, c*tw + w, p]: interpolated rows per channel.

        # ---- column weights: scattered taps over the sublane axis --------
        c_sub = jax.lax.broadcasted_iota(jnp.int32, (block, tile_w, p_pad), 1)
        d = c_sub - rx[:, None, :]
        w_col = jnp.zeros((block, tile_w, p_pad), f32)
        w_col_d = jnp.zeros((block, tile_w, p_pad), f32)
        for k in range(taps):
            m = (d == k).astype(f32)
            w_col = w_col + m * kx[k][:, None, :]
            w_col_d = w_col_d + m * dkx[k][:, None, :]

        # ---- per-channel sample + Gram ------------------------------------
        live = maskf * ok  # [B, P]
        bad = maskf * (1.0 - ok)
        zero = jnp.zeros_like(bad)
        gs = []
        samp_acc = jnp.float32(0.0)
        for c in range(channels):
            tc = tmp[:, c * tile_w : (c + 1) * tile_w, :]
            tdc = tmp_d[:, c * tile_w : (c + 1) * tile_w, :]
            w_v = jnp.sum(w_col * tc, axis=1)  # [B, P]
            dwdx = jnp.sum(w_col_d * tc, axis=1) * live
            dwdy = jnp.sum(w_col * tdc, axis=1) * live
            und = pixdata_ref[:, _ROW_UND + c, :]
            v = (und - w_v) * live
            if ablate == "to_sample":
                samp_acc = samp_acc + jnp.sum(
                    v[0, :128] + dwdx[0, :128] + dwdy[0, :128]
                )
                continue
            h = _h_rows(model, dwdx, dwdy, dxc, dyc)
            rows = h + [v, bad if c == 0 else zero]
            rows = rows + [zero] * (8 - len(rows))
            if group == 1:
                gs.append(jnp.stack(rows, axis=1))  # [B, 8, P]
            else:
                # [B, G*8, P]: subset g's rows are zero outside its lane
                # block, so the Gram contraction over ALL lanes reduces
                # each subset over exactly its own pixels.
                grows = [r * gmasks[g] for g in range(group) for r in rows]
                gs.append(jnp.stack(grows, axis=1))
        if ablate == "to_sample":
            out_ref[:] = jnp.full((block * group, 8, 8), samp_acc, f32)
            return
        g = jnp.concatenate(gs, axis=2) if channels > 1 else gs[0]

        if ablate == "to_interp":
            out_ref[:] = jnp.full(
                (block * group, 8, 8), jnp.sum(g[0, :, :128]), f32
            )
            return

        n_out = block * group
        if gram_mode == "unit":
            # Per-UNIT Gram via one batched dot_general: [B, G8, P] x
            # [B, G8, P] -> [B, G8, G8].  The block-batched "slice" mode
            # computes an [8N, 8N] product whose off-diagonal subset-pair
            # blocks are discarded — N = block*group times the needed
            # FLOPs; batching over the unit axis cuts the waste to
            # `group` (the off-diagonal blocks WITHIN a unit), at one op
            # issue for the whole block.
            gg = jax.lax.dot_general(
                g,
                g,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32,
            )  # [B, G8, G8]
            if group == 1:
                out_ref[:] = gg
            else:
                # Extract each group's diagonal [8, 8] block with a
                # masked FOLD matmul (0/1 rhs, exact): folded[b, 8k+i, j]
                # = gg[b, 8k+i, 8k+j].
                g8 = group * 8
                r_id = jax.lax.broadcasted_iota(
                    jnp.int32, (block, g8, g8), 1
                )
                c_id = jax.lax.broadcasted_iota(
                    jnp.int32, (block, g8, g8), 2
                )
                diag = ((r_id >> 3) == (c_id >> 3)).astype(f32)
                fold_r = jax.lax.broadcasted_iota(
                    jnp.int32, (block, g8, 8), 1
                )
                fold_c = jax.lax.broadcasted_iota(
                    jnp.int32, (block, g8, 8), 2
                )
                fold = ((fold_r & 7) == fold_c).astype(jnp.bfloat16)
                # Mosaic lowers f32xf32 dots at reduced precision here;
                # splitting the lhs into three exact bf16 parts against
                # the 0/1 rhs keeps the fold exact (hardware-verified —
                # the unsplit form loses ~1e-2 relative on the Gram).
                m1, m2, m3 = _split3_bf16(gg * diag)
                lhs = jnp.concatenate([m1, m2, m3], axis=2)
                folded = jax.lax.dot_general(
                    lhs,
                    jnp.concatenate([fold] * 3, axis=1),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32,
                )  # [B, G8, 8]
                out_ref[:] = folded.reshape(n_out, 8, 8)
        elif gram_mode == "subset":
            # One [G*8, P] x [P, G*8] dot per unit.
            for b in range(block):
                gg = jax.lax.dot_general(
                    g[b],
                    g[b],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )
                for k in range(group):
                    out_ref[b * group + k] = gg[
                        8 * k : 8 * k + 8, 8 * k : 8 * k + 8
                    ]
        else:
            # ---- batched Gram: ONE [8N, P] x [P, 8N] matmul per block ----
            # (N = block * group).  Per-subset [8, P] Grams are
            # contraction-bound (P cycles each); one block-wide product
            # computes all of them in the same pass structure
            # (off-diagonal blocks are discarded).
            g_all = g.reshape(n_out * 8, g.shape[-1])
            big = jax.lax.dot_general(
                g_all,
                g_all,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )  # [8N, 8N]
            if gram_mode == "slice":
                for b in range(n_out):
                    out_ref[b] = big[8 * b : 8 * b + 8, 8 * b : 8 * b + 8]
            else:  # "mask": extract every diagonal block without per-subset
                # lane shuffles — zero the off-diagonal blocks, then FOLD
                # the lane axis with a second (0/1, bf16-exact) matmul:
                # folded[8b+i, j] = sum_c masked[8b+i, 8c+j]
                #                 = big[8b+i, 8b+j].
                # (A lane-splitting reshape + sum fails Mosaic layout
                # inference; the matmul form lowers cleanly and replaces
                # n_out per-subset [8, 8] lane-offset slices with two
                # whole-block ops.)
                r_id = jax.lax.broadcasted_iota(
                    jnp.int32, (n_out * 8, n_out * 8), 0
                )
                c_id = jax.lax.broadcasted_iota(
                    jnp.int32, (n_out * 8, n_out * 8), 1
                )
                diag = ((r_id >> 3) == (c_id >> 3)).astype(f32)
                fold_r = jax.lax.broadcasted_iota(
                    jnp.int32, (n_out * 8, 8), 0
                )
                fold_c = jax.lax.broadcasted_iota(
                    jnp.int32, (n_out * 8, 8), 1
                )
                fold = ((fold_r & 7) == fold_c).astype(jnp.bfloat16)
                # Mosaic lowers this f32xf32 dot at reduced precision;
                # splitting the lhs into three bf16 parts against the 0/1
                # rhs makes every product exact (b1+b2+b3 reconstructs
                # the f32 mantissa) — same trick as the tile selection.
                m1, m2, m3 = _split3_bf16(big * diag)
                lhs = jnp.concatenate([m1, m2, m3], axis=1)
                folded = jax.lax.dot_general(
                    lhs,
                    jnp.concatenate([fold] * 3, axis=0),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )  # [8N, 8]
                out_ref[:] = folded.reshape(n_out, 8, 8)

    if dma_w:
        if tile_src == "vmem":
            return kernel_vmem, taps, w_all
        if tile_src == "vmem_roll":
            return kernel_vmem_roll, taps, w_all
        return kernel_dma, taps, w_all
    return kernel, taps, w_all


def extract_tiles(img: jax.Array, origins: jax.Array, tile_h: int,
                  tile_w: int) -> jax.Array:
    """Channel-major tiles: out[i, r, c*tw + w] = img[y0+r, x0+w, c].

    One dynamic_slice per subset; for monochrome images the channel
    transpose is a free reshape.
    """

    def one(org):
        t = jax.lax.dynamic_slice(
            img, (org[0], org[1], 0), (tile_h, tile_w, img.shape[2])
        )
        if img.shape[2] == 1:
            return t.reshape(tile_h, tile_w)
        return t.transpose(0, 2, 1).reshape(tile_h, img.shape[2] * tile_w)

    return jax.vmap(one)(origins)


def subset_bbox(xy: jax.Array, mask: jax.Array) -> jax.Array:
    """[S, 4, 2] axis-aligned bounding-box corners of each subset."""
    big = jnp.float32(1e9)
    mins = jnp.min(jnp.where(mask[..., None], xy, big), axis=1)
    maxs = jnp.max(jnp.where(mask[..., None], xy, -big), axis=1)
    return jnp.stack(
        [
            mins,
            jnp.stack([mins[..., 0], maxs[..., 1]], -1),
            jnp.stack([maxs[..., 0], mins[..., 1]], -1),
            maxs,
        ],
        axis=1,
    )


def pack_pixdata(xy, mask, und_w, center, group: int = 1,
                 p_sub: int | None = None) -> jax.Array:
    """Build the packed [S/G, 8, lanes] pixel array (pixels on lanes).

    und_w: [S, P] or [S, P, C] with C <= 3 (channels land in rows 5..7).
    group: pack G consecutive subsets into one kernel unit — their pixel
      lanes concatenate (subset g of a unit owns lanes [g*p_sub,
      (g+1)*p_sub)); requires S % G == 0.
    p_sub: per-subset lane quota (>= P).  Default = P rounded up to 128
      (one subset per vreg-width multiple); TIGHT packing passes a
      smaller multiple of 8 so small subsets waste no lanes (e.g. 40-px
      coarse-level subsets pack 16-to-640-lanes instead of 4-to-512).
      The unit's total lanes round up to a multiple of 128; tail lanes
      are dead (mask 0).
    """
    s, p = mask.shape
    if und_w.ndim == 2:
        und_w = und_w[..., None]
    channels = und_w.shape[-1]
    if channels > 3:
        raise ValueError(f"at most 3 channels supported, got {channels}")
    if p_sub is None:
        p_sub = -(-p // 128) * 128
    if p_sub < p:
        raise ValueError(f"p_sub {p_sub} < point count {p}")
    maskf = mask.astype(jnp.float32)
    und_rows = [und_w[..., c] for c in range(channels)]
    und_rows += [jnp.zeros_like(maskf)] * (3 - channels)
    rows = jnp.stack(
        [
            xy[..., 0],
            xy[..., 1],
            maskf,
            xy[..., 0] - center[:, 0:1],
            xy[..., 1] - center[:, 1:2],
        ]
        + und_rows,
        axis=1,
    )  # [S, 8, P]
    out = jnp.zeros((s, 8, p_sub), jnp.float32)
    out = out.at[:, :, :p].set(rows)
    if group > 1:
        if s % group:
            raise ValueError(f"group {group} must divide S {s}")
        out = out.reshape(s // group, group, 8, p_sub)
        out = out.transpose(0, 2, 1, 3).reshape(
            s // group, 8, group * p_sub
        )
    lanes = -(-out.shape[-1] // 128) * 128
    if lanes != out.shape[-1]:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, lanes - out.shape[-1])))
    return out


def compute_origins(
    model: FittingModel,
    interp: Interpolation,
    bbox: jax.Array,
    center: jax.Array,
    params: jax.Array,
    padded_h: int,
    padded_w: int,
    tile_h: int,
    tile_w: int,
    group: int = 1,
) -> jax.Array:
    """Tile origins from the warped subset bounding box.

    bbox: [S, 4, 2] the four corners of each subset's axis-aligned bounding
    box (all supported warps are affine, so warped corners bound the warped
    subset).  Origins cover the spline halo and clip inside the padded
    image.  With group G the warped corners of G consecutive subsets merge
    into one unit origin ([S/G, 2]).
    """
    from correlation_tpu.models.warp import warp_points

    corners = warp_points(model, params, bbox, center)  # [S, 4, 2]
    if group > 1:
        corners = corners.reshape(corners.shape[0] // group, 4 * group, 2)
    halo = 1 if interp == Interpolation.BICUBIC else 0
    min_xy = jnp.floor(jnp.min(corners, axis=1)) - (halo + 1)
    x0 = min_xy[..., 0].astype(jnp.int32)
    y0 = min_xy[..., 1].astype(jnp.int32)
    x0 = jnp.clip(x0, 0, max(padded_w - tile_w, 0))
    y0 = jnp.clip(y0, 0, max(padded_h - tile_h, 0))
    # NaN-poisoned parameters: force origin 0 so the kernel's validity logic
    # (which sees NaN positions as invalid) decides.
    finite = jnp.all(jnp.isfinite(corners), axis=(1, 2))
    x0 = jnp.where(finite, x0, 0)
    y0 = jnp.where(finite, y0, 0)
    return jnp.stack([y0, x0], axis=-1)


def choose_tile(
    extent_y: int,
    extent_x: int,
    padded_h: int,
    padded_w: int,
    margin: int = 8,
) -> tuple[int, int]:
    """Static tile dims covering the warped subset + spline halo + warp
    margin, rounded up to the (8, 8) granularity the kernel layouts like."""
    need_h = extent_y + 4 + margin
    need_w = extent_x + 4 + margin
    th = min(-(-need_h // 8) * 8, padded_h)
    tw = min(-(-need_w // 8) * 8, padded_w)
    return int(th), int(tw)


def dma_width(tile_w: int) -> int:
    """Lane width of the in-kernel DMA window: the 128-aligned fetch must
    cover a tile starting at any lane offset dx < 128."""
    return -(-(tile_w + 127) // 128) * 128


# Max padded-image bytes kept VMEM-resident by tile_src="auto"
# (choose_block subtracts this from its working-set budget).
IMG_VMEM_BUDGET = 6 * 1024 * 1024

# Mosaic's default scoped-vmem limit is 16 MB, but a v5e has 128 MB of
# physical VMEM (verified: a 95 MB working set runs on this chip).  The
# raised limit turns choose_block's static working-set estimate — which
# cannot model Mosaic's liveness exactly — from an OOM cliff into a
# block-size tuning knob with 4-5x headroom.
_VMEM_LIMIT = 64 * 1024 * 1024


def _make_compiler_params():
    from jax.experimental.pallas import tpu as _tpu

    if hasattr(_tpu, "CompilerParams"):
        return _tpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    return _tpu.TPUCompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


_COMPILER_PARAMS = _make_compiler_params()


def prepared_img_bytes(img_h: int, img_w: int, channels: int,
                       tile_w: int) -> int:
    """VMEM bytes of prepare_image's padded channel-major output."""
    hp = -(-img_h // 8) * 8 + 8
    wp = -(-img_w // 128) * 128 + dma_width(tile_w)
    return channels * hp * wp * 4


def choose_block(
    tile_h: int, tile_w: int, p_pad: int, channels: int,
    vmem_budget: int = 32 * 1024 * 1024,
    tile_parts: int = 3,
    img_bytes: int = 0,
) -> int:
    """Kernel units per grid step, sized so the kernel's VMEM working set
    (sel scratch + shifted tile copies + double-buffered DMA tiles +
    pixdata blocks) stays within budget.  Returns 0 when even the minimum
    block of 4 cannot fit — callers fall back to the xla_sep backend for
    that level instead of risking a Mosaic VMEM OOM.

    With tile_parts == 1 the selected values are integers 0..255, exact in
    bfloat16, so the dominant sel scratch halves.

    img_bytes: VMEM claimed by the resident level image (tile_src="vmem"
    path — replaces the double-buffered DMA tile scratch)."""
    taps = 4
    w_all = channels * tile_w
    th_eff = tile_h + 8  # DMA sublane-alignment slack
    sel_bytes = 2 if tile_parts == 1 else 4
    per_subset = (
        sel_bytes * taps * w_all * p_pad  # sel scratch
        + 4 * taps * w_all * th_eff * 2  # wide + bf16 parts (approx)
        + 4 * 3 * th_eff * p_pad  # onehot + iota temps
        + 4 * 2 * 8 * p_pad  # double-buffered pixdata
    )
    if not img_bytes:
        per_subset += (  # dbl-buffered DMA tile scratch
            4 * 2 * channels * th_eff * dma_width(tile_w)
        )
    fit = (vmem_budget - img_bytes) // max(per_subset, 1)
    if fit < 8:
        # Mosaic's sublane rule: a multi-step grid needs the second-minor
        # block dim divisible by 8, so 8 is the hard minimum — callers
        # fall back to the xla_sep backend below it.
        return 0
    return min(64, fit & ~7)


def prepare_image(img: jax.Array, tile_w: int) -> jax.Array:
    """Pad + channel-major transpose of the deformed image for the
    in-kernel-DMA path: [H, W, C] -> [C, Hp8+8, Wp128+dma_w] float32.

    Iteration-invariant; the engine calls this once per level per frame
    (prepare_levels) so the LM while-loop body never re-pads the image."""
    h_pad8 = -(-img.shape[0] // 8) * 8
    w_pad128 = -(-img.shape[1] // 128) * 128
    hp = h_pad8 + 8
    wp = w_pad128 + dma_width(tile_w)
    img = jnp.pad(
        img, ((0, hp - img.shape[0]), (0, wp - img.shape[1]), (0, 0))
    )
    return img.transpose(2, 0, 1)


@functools.partial(
    jax.jit,
    static_argnums=(
        0, 1, 2, 3, 4, 5, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22,
    ),
)
def fused_assemble(
    model: FittingModel,
    interp: Interpolation,
    tile_h: int,
    tile_w: int,
    img_h: int,
    img_w: int,
    img: jax.Array,
    pixdata: jax.Array,
    center: jax.Array,
    params: jax.Array,
    bbox: jax.Array,
    block: int = 16,
    interpret: bool = False,
    in_kernel_dma: bool = True,
    img_prepared: bool = False,
    tile_parts: int = 3,
    gram_mode: str = "unit",
    row_slack: bool = False,
    group: int = 1,
    sel_mode: str = "batched",
    tile_src: str = "auto",
    ablate: str = "",
    p_sub: int = 0,
) -> FusedAssembly:
    """Run the fused v2 assembly over all subsets.

    Args:
      model, interp: warp/interpolation models (static).
      tile_h, tile_w: tile dims (static; >= warped subset extent + stencil +
        margin — engine.compute_level_statics).
      img_h, img_w: TRUE image dims (validity windows).
      img: [H, W, C] float32 deformed image (C <= 3), or the output of
        prepare_image when img_prepared (DMA path only).
      pixdata: [S, 8, P_pad] packed per-pixel data (pack_pixdata).
      center: [S, 2] subset centers at this level.
      params: [S, NP] current warp parameters.
      bbox: [S, 4, 2] undeformed bounding-box corners (subset_bbox).
      block: subsets per grid step.
      interpret: run the kernel in interpreter mode (CPU tests).
      in_kernel_dma: fetch the per-subset image tiles inside the kernel via
        aligned HBM->VMEM async copies + a lane roll, double-buffered
        across grid steps (fast path; the XLA alternative is a serial
        vmap(dynamic_slice) loop).  Forced off in interpret mode (the
        interpreter has no DMA).
      img_prepared: img is already prepare_image output (padded,
        channel-major) — skips the in-loop pad/transpose.
      tile_parts: bf16 parts in the selection split: 3 = full f32 mantissa
        (default, exact for any image), 2 = 16 mantissa bits (~1e-5
        relative), 1 = EXACT for integer-valued 0..255 images (uint8
        pyramids) and the fastest — the contraction depth scales with it.
      gram_mode: normal-equation reduction: "unit" = one batched
        dot_general over the unit axis (default — block*group fewer
        wasted FLOPs than "slice" with one op issue), "slice" = one
        block-batched [8N, P] x [P, 8N] matmul with per-subset
        diagonal-block slices, "subset" = one [G8, P] dot per unit,
        "mask" = the [8N, 8N] matmul with mask + 0/1-fold-matmul
        extraction.
      row_slack: DMA path only — keep the <=7 sublane-alignment slack rows
        in the tile (skips the per-subset row roll; the selection contracts
        over tile_h + 8 rows instead).
      group: lane packing — G consecutive subsets share one kernel unit
        (pixdata pre-packed with pack_pixdata(group=G), tile dims covering
        the G-subset UNION), dividing the kernel's per-unit fixed work
        across G subsets.
      p_sub: per-subset lane quota for TIGHT packing (multiple of 8,
        matching pack_pixdata's p_sub; 0 = legacy 128-multiple quota).
        Small subsets then waste no lanes: a 40-px coarse-level subset
        occupies 40 lanes instead of 128, tripling the useful work per
        vector op.  Lanes beyond group*p_sub are dead tail (mask 0).
      sel_mode: row-selection matmul issue: "batched" = one batched
        dot_general for the whole block (default), "loop" = one dot per
        unit (the pre-round-4 form, kept for A/B).
      tile_src: where per-unit tiles come from on the in_kernel_dma path:
        "vmem" = the whole padded level image sits VMEM-resident and
        tiles are direct slices (no DMA, no per-assembly HBM re-fetch),
        "dma" = double-buffered per-unit async copies (images too big
        for VMEM), "auto" = vmem when the padded image fits
        IMG_VMEM_BUDGET.

    Returns:
      FusedAssembly(A, b, chi, err) matching assemble_normal_equations.
    """
    units, _, p_pad = pixdata.shape  # units >= S // group; p_pad = total
    s = params.shape[0]
    if s % group or s // group > units:
        raise ValueError(
            f"params S={s} incompatible with pixdata units {units} "
            f"* group {group}"
        )
    # pixdata may arrive PRE-PADDED to a block multiple (prepare_levels
    # does this so the pad is not re-executed inside the LM while loop —
    # it is loop-invariant but XLA does not hoist it past the kernel).
    units_real = s // group
    num_p = params.shape[-1]
    channels = int(img.shape[0] if img_prepared else img.shape[-1])
    if interpret:
        in_kernel_dma = False
    if tile_src == "auto":
        tile_src = (
            "vmem"
            if prepared_img_bytes(img_h, img_w, channels, tile_w)
            <= IMG_VMEM_BUDGET
            else "dma"
        )

    h_pad8 = -(-img_h // 8) * 8
    w_pad128 = -(-img_w // 128) * 128
    if in_kernel_dma:
        # The DMA fetches tile_h + 8 rows (source offset aligns DOWN to a
        # multiple of 8); with row_slack=False the in-kernel sublane roll
        # strips the slack so the body sees exactly tile_h rows.  The
        # "vmem" (MXU-realign) source always works on the full fetch with
        # the 8-aligned y origin — the row-selection one-hot absorbs the
        # <=7 slack rows, so no row realignment ever happens.
        th_fetch = tile_h + 8
        if tile_src == "vmem":
            row_slack = True
        th_body = th_fetch if row_slack else tile_h
        dma_w = dma_width(tile_w)
        if not img_prepared:
            img = prepare_image(img, tile_w)
        origins = compute_origins(
            model, interp, bbox, center, params,
            h_pad8, w_pad128, tile_h, tile_w, group=group,
        )
        if row_slack:
            # Tile rows start at the 8-aligned y; x is exact after the
            # lane realignment.
            org_body = jnp.stack(
                [origins[:, 0] & ~7, origins[:, 1]], axis=-1
            )
        else:
            org_body = origins
    else:
        if img_prepared:
            raise ValueError("img_prepared requires in_kernel_dma")
        th_body = tile_h
        pad_h = max(tile_h - img.shape[0], 0)
        pad_w = max(tile_w - img.shape[1], 0)
        if pad_h or pad_w:
            img = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
        origins = compute_origins(
            model, interp, bbox, center, params,
            int(img.shape[0]), int(img.shape[1]), tile_h, tile_w,
            group=group,
        )
        org_body = origins
        tiles = extract_tiles(img, origins, tile_h, tile_w)

    block = max(1, min(block, units))
    if block % 8 and -(-units // block) > 1:
        # Mosaic requires the second-minor block dim divisible by 8
        # unless the block spans the whole array (single grid step).
        block = min(-(-block // 8) * 8, units)
    u_pad = -(-units // block) * block
    if u_pad != units:
        pixdata = jnp.pad(
            pixdata, ((0, u_pad - units), (0, 0), (0, 0))
        )
    if u_pad != units_real:
        grow = u_pad - units_real
        params = jnp.pad(params, ((0, grow * group), (0, 0)))
        origins = jnp.pad(origins, ((0, grow), (0, 0)))
        org_body = jnp.pad(org_body, ((0, grow), (0, 0)))
        if not in_kernel_dma:
            tiles = jnp.pad(tiles, ((0, grow), (0, 0), (0, 0)))
    s_pad = u_pad * group

    # Per-unit parameter rows: [U, G*8] with each group's NP params in its
    # own 8-slot band.
    scal = jnp.zeros((u_pad, group, 8), jnp.float32)
    scal = scal.at[:, :, :num_p].set(
        params.reshape(u_pad, group, num_p)
    )
    scal = scal.reshape(u_pad, group * 8)

    kernel, taps, w_all = _make_kernel(
        model, interp, img_h, img_w, th_body, tile_w, channels, block, p_pad,
        dma_w=dma_w if in_kernel_dma else 0,
        tile_parts=tile_parts,
        gram_mode=gram_mode,
        row_slack=row_slack,
        th_fetch=th_fetch if in_kernel_dma else 0,
        group=group,
        sel_mode=sel_mode,
        tile_src=tile_src,
        ablate=ablate,
        p_sub=p_sub,
    )
    flops = u_pad * (
        2 * (taps * w_all) * tile_parts * th_body * p_pad
        + 2 * 8 * 8 * p_pad
        * (block * group if gram_mode != "subset" else group)
    )
    sel_dtype = jnp.bfloat16 if tile_parts == 1 else jnp.float32
    gb = group * 8
    common = [
        pl.BlockSpec((block, 8, p_pad), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block, gb), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 2), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((block * group, 8, 8), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((s_pad, 8, 8), jnp.float32)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=u_pad * (tile_h * w_all * 4 + p_pad * 8 * 4 + 256),
        transcendentals=0,
    )
    if in_kernel_dma:
        # Under PrefetchScalarGridSpec every index_map also receives the
        # scalar-prefetch ref(s) after the grid indices.
        common_sp = [
            pl.BlockSpec((block, 8, p_pad), lambda i, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, gb), lambda i, o: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 2), lambda i, o: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        if tile_src in ("vmem", "vmem_roll"):
            img_spec = pl.BlockSpec(
                img.shape, lambda i, o: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            scratch = [
                pltpu.VMEM((block, taps * w_all, p_pad), sel_dtype),
            ]
        else:
            img_spec = pl.BlockSpec(memory_space=pl.ANY)
            scratch = [
                pltpu.VMEM((block, taps * w_all, p_pad), sel_dtype),
                pltpu.VMEM(
                    (2, block * channels, th_fetch, dma_w), jnp.float32
                ),
                pltpu.SemaphoreType.DMA((2, block * channels)),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # full origins array, read ahead for
            grid=(u_pad // block,),  # the next block's DMA issue
            in_specs=common_sp + [img_spec],
            out_specs=pl.BlockSpec(
                (block * group, 8, 8), lambda i, o: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(origins.reshape(-1), pixdata, scal, org_body, img)
    else:
        out = pl.pallas_call(
            kernel,
            grid=(u_pad // block,),
            in_specs=common + [
                pl.BlockSpec((block, tile_h, channels * tile_w),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((block, taps * w_all, p_pad), sel_dtype),
            ],
            cost_estimate=cost,
            interpret=interpret,
            compiler_params=_COMPILER_PARAMS,
        )(pixdata, scal, org_body, tiles)

    a_mat = out[:s, :num_p, :num_p]
    b_vec = out[:s, :num_p, num_p]
    chi = out[:s, num_p, num_p]
    err = out[:s, num_p + 1, num_p + 1] > 0.0
    return FusedAssembly(a_mat, b_vec, chi, err, out[:s].reshape(s, 64))
