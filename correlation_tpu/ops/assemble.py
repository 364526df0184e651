"""Fused Gauss-Newton normal-equation assembly, batched over subsets.

The batched TPU analog of the reference's hottest code — the per-pixel loop in
InterpolationClass::get_multiple_interpolations (interpolation_class.cpp:
671-764) and the fused CUDA kernel kCorrelation (correlationKernel.cu:122-268):

    per pixel:  V    = und_w - W(def_xy)
                H[p] = dW/dx * dTx/dp + dW/dy * dTy/dp
    reduce:     chi += V^2 ;  b += H V ;  A += H H^T

Instead of thread fan-out (CPU) or a shared-memory block reduction (CUDA),
the pixel axis reduces with one batched matmul A = H^T H on the MXU and the
subset axis is a leading batch dimension sharded over the device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from correlation_tpu.config import FittingModel, Interpolation
from correlation_tpu.models.warp import warp_jacobian, warp_points
from correlation_tpu.ops.interp import InterpField, sample_field


def assemble_normal_equations(
    model: FittingModel,
    interp: Interpolation,
    def_field: InterpField,
    und_w: jax.Array,
    xy: jax.Array,
    mask: jax.Array,
    center: jax.Array,
    params: jax.Array,
):
    """Assemble per-subset A, b, chi (unscaled sums, like the reference).

    Args:
      model: warp model.
      interp: interpolation model.
      def_field: coefficient field of the deformed image at this level.
      und_w: [S, P, C] undeformed intensities at the (rounded) subset pixels
        (iteration-invariant; gathered once per level with sample_integer).
      xy: [S, P, 2] undeformed pixel positions at this level.
      mask: [S, P] bool; False entries are padding.
      center: [S, 2] undeformed subset centers at this level.
      params: [S, NP] current warp parameters.

    Returns:
      a_mat: [S, NP, NP] sum of H H^T over real, in-image pixels,
      b_vec: [S, NP] sum of H V,
      chi:   [S] sum of V^2,
      err:   [S] bool — True if any real pixel sampled out of image
             (== error_interpolation_out_of_image,
             interpolation_class.cpp:129-137).
    """
    def_xy = warp_points(model, params, xy, center)  # [S, P, 2]
    w, dwdx, dwdy, valid = sample_field(def_field, interp, def_xy)  # [S, P, C]

    err = jnp.any(mask & ~valid, axis=-1)
    live = (mask & valid)[..., None].astype(w.dtype)  # [S, P, 1]

    v = (und_w - w) * live  # [S, P, C]
    # Steepest-descent images per color: H = dwdx * dTx/dp + dwdy * dTy/dp
    # (interpolation_class.cpp:728-739); the warp Jacobian has no color axis.
    jac_x, jac_y = warp_jacobian(model, xy, center)  # [S, P, NP]
    h = (
        (dwdx * live)[..., None] * jac_x[:, :, None, :]
        + (dwdy * live)[..., None] * jac_y[:, :, None, :]
    )  # [S, P, C, NP]

    s, p, c, np_ = h.shape
    h_rows = h.reshape(s, p * c, np_)
    v_rows = v.reshape(s, p * c)

    # One Gram matmul G^T G with G = [H | V] yields A, b, chi together
    # (one pass over the steepest-descent rows instead of three; same trick
    # as the Pallas kernel's [8, 8] reduction).  HIGHEST precision: the
    # MXU's default bf16 passes are not accurate enough for the 1e-4 parity
    # bar on A's entries.
    g_rows = jnp.concatenate([h_rows, v_rows[..., None]], axis=-1)
    m = jnp.matmul(
        g_rows.transpose(0, 2, 1),
        g_rows,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    a_mat = m[:, :np_, :np_]
    b_vec = m[:, :np_, np_]
    chi = m[:, np_, np_]
    return a_mat, b_vec, chi, err
