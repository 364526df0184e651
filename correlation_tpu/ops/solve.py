"""Batched Levenberg-Marquardt parameter updates for tiny (NP <= 6) systems.

Replaces CorrelationClass::compute_model_parameters + solve()
(correlation_class.cpp:642-704, 719-768 — Eigen QR) and the cuSolver Cholesky
path (cuda_solver.cu:119-149) with one batched dense solve over all subsets.

The reference's scaling-for-precision (A, b scaled by 1/N) and LM diagonal
damping diag *= (1 + lambda) are applied identically
(correlation_class.cpp:647-665, kernels.cu:12-37).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lm_delta(
    a_mat: jax.Array,
    b_vec: jax.Array,
    lam: jax.Array,
    scaling: jax.Array,
) -> jax.Array:
    """Solve (scaling*A + lambda-damped diagonal) dp = scaling*b per subset.

    Args:
      a_mat: [S, NP, NP] unscaled Gauss-Newton matrix sums.
      b_vec: [S, NP] unscaled right-hand sides.
      lam: [S] per-subset LM damping.
      scaling: [S] per-subset 1/N precision scaling
        (correlation_class.cpp:402).

    Returns:
      dp: [S, NP] parameter updates.  Singular systems yield non-finite
      values; the LM driver treats those as diverging steps.
    """
    a_scaled = a_mat * scaling[:, None, None]
    b_scaled = b_vec * scaling[:, None]
    np_ = a_mat.shape[-1]
    eye = jnp.eye(np_, dtype=a_mat.dtype)
    a_damped = a_scaled * (1.0 + lam[:, None, None] * eye)
    # Batched small dense solve; A is symmetric positive semi-definite with
    # LM damping, Cholesky is the natural factorization (== cuSolver spotrf/
    # spotrs in the reference GPU engine).
    chol = jnp.linalg.cholesky(a_damped)
    dp = jax.scipy.linalg.cho_solve((chol, True), b_scaled[..., None])[..., 0]
    return dp
