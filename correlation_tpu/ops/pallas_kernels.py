"""Fused Pallas TPU kernel for normal-equation assembly.

The TPU-native analog of the reference's fused CUDA kernel `kCorrelation`
(correlationKernel.cu:122-268).  One grid step processes one subset:

  1. DMA the subset's deformed-image tile (bounding box of the warped
     subset + spline halo) from HBM into VMEM — the counterpart of CUDA
     texture reads, but explicitly staged.
  2. Warp the subset pixels (VPU).
  3. Sample intensity + gradients by the *separable* form of the
     reference's finite-difference-constrained bicubic: that interpolant is
     exactly the Catmull-Rom cubic convolution (verified numerically against
     the 16x16-matrix formulation), so the per-pixel 4x4 neighborhood
     gather becomes two small matmuls against the VMEM tile:

        tmp  = W_row  @ tile          [P, th] x [th, tw]   (MXU)
        w    = sum(W_col  * tmp, -1)                       (VPU)
        dwdx = sum(W_col' * tmp, -1)                       (VPU)
        dwdy = sum(W_col  * (W_row' @ tile), -1)           (VPU/MXU)

     where W_row[p, r] holds the 4 cubic weights of pixel p scattered to
     its tile rows.  No gather instructions at all.
  4. Build G = [H | V | bad] and reduce M = G^T G in one MXU matmul:
     A = M[:np, :np], b = M[:np, np], chi = M[np, np],
     bad-pixel count = M[np+1, np+1].

Out-of-image samples follow the reference's validity windows
(interpolation_class.cpp:82-83,143-144,200-201).  A pixel whose neighborhood
falls outside the DMA'd tile (warp larger than the tile margin allows) is
also flagged — the engine surfaces both as
error_interpolation_out_of_image; tiles are sized so this only triggers for
extreme warps that are about to leave the image anyway.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correlation_tpu.config import FittingModel, Interpolation

# pixdata column layout ([S, P_pad, 8] f32)
_COL_X = 0
_COL_Y = 1
_COL_MASK = 2
_COL_UND = 3
_COL_DXC = 4  # x - center_x
_COL_DYC = 5  # y - center_y

# scalar-prefetch float column layout ([S, 8] f32): params (up to 6), pad
# scalar-prefetch int column layout ([S, 2] i32): y0, x0


def _cubic_weights(t):
    """Catmull-Rom weights for taps at offsets -1..2 around the anchor.

    Equivalent to the reference bicubic (see module docstring); t in [0, 1).
    """
    t2 = t * t
    t3 = t2 * t
    return (
        -0.5 * t + t2 - 0.5 * t3,
        1.0 - 2.5 * t2 + 1.5 * t3,
        0.5 * t + 2.0 * t2 - 1.5 * t3,
        -0.5 * t2 + 0.5 * t3,
    )


def _cubic_dweights(t):
    t2 = t * t
    return (
        -0.5 + 2.0 * t - 1.5 * t2,
        -5.0 * t + 4.5 * t2,
        0.5 + 4.0 * t - 4.5 * t2,
        -t + 1.5 * t2,
    )


def _scatter_weights(rel, taps, extent):
    """Build W[p, r] = taps[j][p] where r == rel[p] + j.

    rel: [P, 1] int32 tile-row of tap 0; taps: tuple of [P, 1] floats.
    Returns [P, extent] f32.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (rel.shape[0], extent), 1)
    d = r - rel
    w = jnp.zeros((rel.shape[0], extent), jnp.float32)
    for j, tap in enumerate(taps):
        w = w + jnp.where(d == j, tap, 0.0)
    return w


def _g_columns(model: FittingModel, dwdx, dwdy, dxc, dyc, v, bad):
    """Assemble the 8 columns of G per warp model ([P,1] each).

    H columns replicate the steepest-descent layout
    (interpolation_class.cpp:728-739, model_class.cpp:48-202)."""
    if model == FittingModel.U:
        h = [dwdx]
    elif model == FittingModel.UV:
        h = [dwdx, dwdy]
    elif model == FittingModel.UVQ:
        h = [dwdx, dwdy, -dwdx * dyc + dwdy * dxc]
    elif model == FittingModel.AFFINE:
        h = [dwdx, dwdy, dwdx * dxc, dwdx * dyc, dwdy * dxc, dwdy * dyc]
    else:
        raise ValueError(f"unknown model {model}")
    zero = jnp.zeros_like(dwdx)
    cols = h + [v, bad]
    cols = cols + [zero] * (8 - len(cols))
    return jnp.concatenate(cols, axis=1)


def _warp(model: FittingModel, get_param, x, y, dxc, dyc):
    """Apply the warp; get_param(k) reads the k-th scalar parameter."""
    p = [get_param(k) for k in range(6)]
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


def _sample_and_reduce(
    model: FittingModel,
    interp: Interpolation,
    img_h: int,
    img_w: int,
    tile_h: int,
    tile_w: int,
    pix,
    get_param,
    x0,
    y0,
    get_tile,
):
    """Shared kernel core: warp, separable sample, G^T G reduction.

    pix: [P, 8] packed pixel block; get_param(k): scalar parameter reader;
    x0/y0: this subset's tile origin (scalars); get_tile(): returns the
    [tile_h, tile_w] image tile (called after the weights are built so a
    DMA can overlap them).  Returns the [8, 8] Gram matrix.
    """
    bicubic = interp == Interpolation.BICUBIC

    if True:  # keep the original indentation structure
        x = pix[:, _COL_X : _COL_X + 1]
        y = pix[:, _COL_Y : _COL_Y + 1]
        mask = pix[:, _COL_MASK : _COL_MASK + 1]
        und_w = pix[:, _COL_UND : _COL_UND + 1]
        dxc = pix[:, _COL_DXC : _COL_DXC + 1]
        dyc = pix[:, _COL_DYC : _COL_DYC + 1]

        xd, yd = _warp(model, get_param, x, y, dxc, dyc)

        if bicubic:
            # interpolation_class.cpp:82-83 (strict window)
            valid = (
                (xd > 1.0)
                & (yd > 1.0)
                & (xd < img_w - 2.0)
                & (yd < img_h - 2.0)
            )
            anchor_x = jnp.floor(xd)
            anchor_y = jnp.floor(yd)
            tx = xd - anchor_x
            ty = yd - anchor_y
            rx = anchor_x.astype(jnp.int32) - 1 - x0
            ry = anchor_y.astype(jnp.int32) - 1 - y0
            taps = 4
            kx = _cubic_weights(tx)
            ky = _cubic_weights(ty)
            dkx = _cubic_dweights(tx)
            dky = _cubic_dweights(ty)
        elif interp == Interpolation.BILINEAR:
            valid = (
                (xd > 0.0)
                & (yd > 0.0)
                & (xd < img_w - 1.0)
                & (yd < img_h - 1.0)
            )
            anchor_x = jnp.floor(xd)
            anchor_y = jnp.floor(yd)
            tx = xd - anchor_x
            ty = yd - anchor_y
            rx = anchor_x.astype(jnp.int32) - x0
            ry = anchor_y.astype(jnp.int32) - y0
            taps = 2
            one = jnp.ones_like(tx)
            kx = (1.0 - tx, tx)
            ky = (1.0 - ty, ty)
            dkx = (-one, one)
            dky = (-one, one)
        else:  # NEAREST: value at rounded pixel, forward-difference grads
            valid = (
                (xd > 0.0)
                & (yd > 0.0)
                & (xd < img_w - 1.0)
                & (yd < img_h - 1.0)
            )
            anchor_x = jnp.floor(xd + 0.5)
            anchor_y = jnp.floor(yd + 0.5)
            rx = anchor_x.astype(jnp.int32) - x0
            ry = anchor_y.astype(jnp.int32) - y0
            taps = 2
            one = jnp.ones_like(xd)
            zero = jnp.zeros_like(xd)
            kx = (one, zero)
            ky = (one, zero)
            dkx = (-one, one)
            dky = (-one, one)

        in_tile = (
            (rx >= 0)
            & (rx <= tile_w - taps)
            & (ry >= 0)
            & (ry <= tile_h - taps)
        )
        ok = valid & in_tile
        rx = jnp.clip(rx, 0, tile_w - taps)
        ry = jnp.clip(ry, 0, tile_h - taps)

        w_row = _scatter_weights(ry, ky, tile_h)
        w_row_d = _scatter_weights(ry, dky, tile_h)
        w_col = _scatter_weights(rx, kx, tile_w)
        w_col_d = _scatter_weights(rx, dkx, tile_w)

        t = get_tile()  # [tile_h, tile_w]
        tmp = jnp.dot(w_row, t, preferred_element_type=jnp.float32)
        tmp_d = jnp.dot(w_row_d, t, preferred_element_type=jnp.float32)
        wv = jnp.sum(w_col * tmp, axis=1, keepdims=True)
        dwdx = jnp.sum(w_col_d * tmp, axis=1, keepdims=True)
        dwdy = jnp.sum(w_col * tmp_d, axis=1, keepdims=True)

        live = mask * ok.astype(jnp.float32)
        bad = mask * (1.0 - ok.astype(jnp.float32))
        v = (und_w - wv) * live
        dwdx = dwdx * live
        dwdy = dwdy * live

        g = _g_columns(model, dwdx, dwdy, dxc, dyc, v, bad)
        return jax.lax.dot_general(
            g,
            g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _make_kernel(
    model: FittingModel,
    interp: Interpolation,
    img_h: int,
    img_w: int,
    padded_h: int,
    padded_w: int,
    tile_h: int,
    tile_w: int,
):
    """Manual-DMA kernel: the image stays in HBM; each grid step DMAs its
    subset's tile into VMEM (started before weight construction, waited
    just before the tile matmuls)."""

    def kernel(org_ref, pixdata_ref, params_ref, img_ref, out_ref, tile, sem):
        i = pl.program_id(0)
        # Origins are pre-aligned by compute_origins; re-clamp and re-align
        # in-kernel so the DMA can never leave the padded image even on
        # garbage input, and so Mosaic can prove the slice offsets respect
        # the (8, 128) HBM tiling.
        y0 = jnp.clip(org_ref[i, 0], 0, padded_h - tile_h) & ~7
        x0 = jnp.clip(org_ref[i, 1], 0, padded_w - tile_w) & ~127
        y0 = pl.multiple_of(y0, 8)
        x0 = pl.multiple_of(x0, 128)

        copy = pltpu.make_async_copy(
            img_ref.at[pl.ds(y0, tile_h), pl.ds(x0, tile_w)], tile, sem
        )
        copy.start()

        def get_tile():
            copy.wait()
            return tile[:]

        out_ref[0] = _sample_and_reduce(
            model, interp, img_h, img_w, tile_h, tile_w,
            pixdata_ref[0], lambda k: params_ref[0, 0, k], x0, y0, get_tile,
        )

    return kernel


def _make_tiles_kernel(
    model: FittingModel,
    interp: Interpolation,
    img_h: int,
    img_w: int,
    tile_h: int,
    tile_w: int,
    block: int,
):
    """Tiles-as-input kernel: tiles are pre-extracted with XLA and arrive
    through the standard blocked-input pipeline (no manual DMA).  Each grid
    step processes `block` subsets to amortize per-step overhead."""

    def kernel(pixdata_ref, params_ref, org_ref, tiles_ref, out_ref):
        for b in range(block):
            out_ref[b] = _sample_and_reduce(
                model, interp, img_h, img_w, tile_h, tile_w,
                pixdata_ref[b],
                lambda k, _b=b: params_ref[_b, 0, k],
                org_ref[b, 0, 1], org_ref[b, 0, 0],
                lambda _b=b: tiles_ref[_b],
            )

    return kernel


class FusedAssembly(NamedTuple):
    a_mat: jax.Array  # [S, NP, NP]
    b_vec: jax.Array  # [S, NP]
    chi: jax.Array  # [S]
    err: jax.Array  # [S] bool


@functools.partial(
    jax.jit, static_argnums=(0, 1, 2, 3, 4, 5)
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
    params: jax.Array,
    origins: jax.Array,
) -> FusedAssembly:
    """Run the fused assembly kernel over all subsets.

    Args:
      model, interp: warp/interpolation models (static).
      tile_h, tile_w: VMEM tile dims (static; >= warped subset extent + halo
        + DMA alignment slack — see choose_tile).
      img_h, img_w: TRUE image dims (validity windows).
      img: [Hp, Wp] float32 deformed image, padded with pad_image_for_dma.
      pixdata: [S, P_pad, 8] packed per-pixel data (see _COL_*).
      params: [S, NP] current warp parameters.
      origins: [S, 2] int32 aligned tile origins (compute_origins).

    Returns:
      FusedAssembly(A, b, chi, err) matching assemble_normal_equations.
    """
    s, p_pad, _ = pixdata.shape
    num_p = params.shape[-1]
    padded_h, padded_w = img.shape

    # pad params to the 6 slots the kernel reads + 2 spare -> [S, 1, 8]
    scal = jnp.zeros((s, 1, 8), jnp.float32)
    scal = scal.at[:, 0, :num_p].set(params)

    kernel = _make_kernel(
        model, interp, img_h, img_w, padded_h, padded_w, tile_h, tile_w
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # origins
        grid=(s,),
        in_specs=[
            pl.BlockSpec(
                (1, p_pad, 8),
                lambda i, org: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 8), lambda i, org: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # img stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 8), lambda i, org: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_h, tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    flops_dot = 2 * p_pad * tile_h * tile_w * 2 + 2 * p_pad * 8 * 8
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, 8, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=s * flops_dot,
            bytes_accessed=s * (tile_h * tile_w * 4 + p_pad * 8 * 4 + 256),
            transcendentals=0,
        ),
    )(origins, pixdata, scal, img)

    a_mat = out[:, :num_p, :num_p]
    b_vec = out[:, :num_p, num_p]
    chi = out[:, num_p, num_p]
    err = out[:, num_p + 1, num_p + 1] > 0.0
    return FusedAssembly(a_mat, b_vec, chi, err)


def extract_tiles(img: jax.Array, origins: jax.Array, tile_h: int,
                  tile_w: int) -> jax.Array:
    """XLA tile extraction: tiles[i] = img[y0:y0+th, x0:x0+tw].

    A vmapped dynamic_slice — XLA lowers this to per-subset block copies,
    avoiding manual in-kernel DMA (start indices clamp to bounds exactly
    like compute_origins does).
    """

    def one(org):
        return jax.lax.dynamic_slice(img, (org[0], org[1]), (tile_h, tile_w))

    return jax.vmap(one)(origins)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 10))
def fused_assemble_tiles(
    model: FittingModel,
    interp: Interpolation,
    tile_h: int,
    tile_w: int,
    img_h: int,
    img_w: int,
    img: jax.Array,
    pixdata: jax.Array,
    params: jax.Array,
    origins: jax.Array,
    block: int = 8,
) -> FusedAssembly:
    """fused_assemble variant without manual DMA: tiles are pre-extracted
    with XLA and streamed through the standard blocked-input pipeline,
    `block` subsets per grid step."""
    s, p_pad, _ = pixdata.shape
    num_p = params.shape[-1]
    block = max(1, min(block, s))
    s_pad = -(-s // block) * block
    if s_pad != s:
        grow = s_pad - s
        pixdata = jnp.pad(pixdata, ((0, grow), (0, 0), (0, 0)))
        params = jnp.pad(params, ((0, grow), (0, 0)))
        origins = jnp.pad(origins, ((0, grow), (0, 0)))

    scal = jnp.zeros((s_pad, 1, 8), jnp.float32)
    scal = scal.at[:, 0, :num_p].set(params)
    tiles = extract_tiles(img, origins, tile_h, tile_w)

    kernel = _make_tiles_kernel(
        model, interp, img_h, img_w, tile_h, tile_w, block
    )
    out = pl.pallas_call(
        kernel,
        grid=(s_pad // block,),
        in_specs=[
            pl.BlockSpec((block, p_pad, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, tile_h, tile_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 8, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, 8, 8), jnp.float32),
    )(pixdata, scal, origins[:, None, :], tiles)

    a_mat = out[:s, :num_p, :num_p]
    b_vec = out[:s, :num_p, num_p]
    chi = out[:s, num_p, num_p]
    err = out[:s, num_p + 1, num_p + 1] > 0.0
    return FusedAssembly(a_mat, b_vec, chi, err)


def pack_pixdata(xy, mask, und_w, center) -> jax.Array:
    """Build the packed [S, P_pad, 8] pixel array (P padded to sublanes).

    und_w must be single-channel ([S, P] or [S, P, 1]); the fused kernel
    currently handles monochrome images (the XLA path handles color).
    """
    s, p = mask.shape
    if und_w.ndim == 3:
        und_w = und_w[..., 0]
    p_pad = -(-p // 8) * 8
    out = jnp.zeros((s, p_pad, 8), jnp.float32)
    maskf = mask.astype(jnp.float32)
    cols = jnp.stack(
        [
            xy[..., 0],
            xy[..., 1],
            maskf,
            und_w,
            xy[..., 0] - center[:, 0:1],
            xy[..., 1] - center[:, 1:2],
            jnp.zeros_like(maskf),
            jnp.zeros_like(maskf),
        ],
        axis=-1,
    )
    return out.at[:, :p, :].set(cols)


def pad_image_for_dma(img: jax.Array) -> jax.Array:
    """Zero-pad [H, W] to sublane/lane multiples (8, 128).

    Mosaic requires DMA slice offsets and the source dims to respect the
    (8, 128) HBM tiling; validity windows keep using the TRUE dims, so the
    padding never influences results.
    """
    h, w = img.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    if hp == h and wp == w:
        return img
    return jnp.pad(img, ((0, hp - h), (0, wp - w)))


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
    align: bool = True,
) -> jax.Array:
    """Tile origins from the warped subset bounding box.

    bbox: [S, 4, 2] the four corners of each subset's axis-aligned bounding
    box (all supported warps are affine, so warped corners bound the warped
    subset).  Origins cover the spline halo and clip inside the padded
    image; align=True additionally aligns DOWN to the (8, 128) tiling the
    manual-DMA kernel requires (the tiles kernel extracts with
    dynamic_slice and needs no alignment).
    """
    from correlation_tpu.models.warp import warp_points

    corners = warp_points(model, params, bbox, center)  # [S, 4, 2]
    halo = 1 if interp == Interpolation.BICUBIC else 0
    min_xy = jnp.floor(jnp.min(corners, axis=1)) - (halo + 1)
    x0 = min_xy[..., 0].astype(jnp.int32)
    y0 = min_xy[..., 1].astype(jnp.int32)
    if align:
        x0 = x0 & ~127
        y0 = y0 & ~7
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
    for_dma: bool = False,
) -> tuple[int, int]:
    """Static tile dims covering the warped subset + spline halo + warp
    margin.  for_dma adds the origin-alignment slack of the manual-DMA
    kernel (origins align down to (8, 128)); the tiles kernel extracts at
    exact offsets and keeps tiles tight."""
    if for_dma:
        need_h = extent_y + 4 + margin + 7
        need_w = extent_x + 4 + margin + 127
        th = min(-(-need_h // 8) * 8, padded_h)
        tw = min(-(-need_w // 128) * 128, padded_w)
    else:
        need_h = extent_y + 4 + margin
        need_w = extent_x + 4 + margin
        th = min(-(-need_h // 8) * 8, padded_h)
        tw = min(-(-need_w // 8) * 8, padded_w)
    return int(th), int(tw)
