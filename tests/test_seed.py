"""Phase-correlation auto-seeding (ops/seed.py) — the headless automatic
initial-guess mode (reference enums.hpp:41 'Auto' is a GUI guess archive;
large displacements need a real seed)."""

import numpy as np

from correlation_tpu.config import (
    FittingModel,
    Interpolation,
    PyramidConfig,
    SolverConfig,
)
from correlation_tpu.domains import make_batch
from correlation_tpu.engine import correlate
from correlation_tpu.ops.seed import (
    global_guess_from_pair,
    phase_correlation_guess,
)
from synthetic import Speckle


def test_phase_correlation_recovers_integer_shift():
    spk = Speckle(128, 128, seed=44)
    und = spk.image(quantize=True)[..., None]
    dfm = np.roll(und, (7, -11), axis=(0, 1))  # u=-11, v=7
    centers = np.array([[64.0, 64.0], [40.0, 80.0]], np.float32)
    uv = phase_correlation_guess(und, dfm, centers, win=64)
    np.testing.assert_array_equal(uv, [[-11.0, 7.0], [-11.0, 7.0]])


def test_auto_seed_unlocks_large_displacement():
    """A 17-px shift is far outside the 3-level pyramid capture range from
    a zero guess; the phase-correlation seed brings the LM solver home."""
    import jax.numpy as jnp

    from correlation_tpu.ops.pyramid import build_pyramid

    spk = Speckle(128, 128, seed=45)
    true_u, true_v = 17.3, -9.6
    und = spk.image(quantize=True)[..., None]
    dfm = spk.warped_image(u=true_u, v=true_v, quantize=True)[..., None]

    cfg = SolverConfig(
        model=FittingModel.UV,
        interpolation=Interpolation.BICUBIC,
        pyramid=PyramidConfig(0, 1, 2),
        precision=1e-5,
    )
    gx, gy = np.meshgrid(np.arange(50, 75), np.arange(50, 75), indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
    batch = make_batch([pts], None, 2)
    und_pyr = build_pyramid(jnp.asarray(und), 2)
    def_pyr = build_pyramid(jnp.asarray(dfm), 2)

    seed = global_guess_from_pair(und, dfm, batch.center0[0], 2)
    np.testing.assert_allclose(seed, [17.0, -10.0], atol=1.01)

    res = correlate(cfg, und_pyr, def_pyr, batch, seed[None, :])
    assert int(res.error[0]) == 0
    np.testing.assert_allclose(
        np.asarray(res.params)[0], [true_u, true_v], atol=0.05
    )

    # and the zero guess indeed fails to find it (documents why the seed
    # exists; the solver lands in a false minimum or errors out)
    res0 = correlate(cfg, und_pyr, def_pyr, batch,
                     np.zeros((1, 2), np.float32))
    p0 = np.asarray(res0.params)[0]
    assert int(res0.error[0]) != 0 or abs(p0[0] - true_u) > 1.0
