"""Multi-device sharding on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from correlation_tpu.config import (
    FittingModel,
    Interpolation,
    PyramidConfig,
    SolverConfig,
)
from correlation_tpu.domains import make_batch
from correlation_tpu.engine import _correlate_jit, correlate
from correlation_tpu.ops.assemble import assemble_normal_equations
from correlation_tpu.ops.interp import precompute_field, sample_integer
from correlation_tpu.ops.pyramid import build_pyramid
from correlation_tpu.parallel.collectives import (
    assemble_pixel_sharded,
    make_pixel_mesh,
)
from correlation_tpu.parallel.mesh import (
    make_mesh,
    pad_to_mesh,
    replicate,
    shard_inputs,
)
from synthetic import Speckle


def _grid(x0, y0, x1, y1):
    gx, gy = np.meshgrid(
        np.arange(x0, x1 + 1), np.arange(y0, y1 + 1), indexing="ij"
    )
    return np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)


def test_subset_sharded_solve_matches_single_device():
    assert len(jax.devices()) == 8
    spk = Speckle(80, 80, seed=41)
    und = spk.image(quantize=True)[..., None]
    dfm = spk.warped_image(u=0.9, v=-0.6, quantize=True)[..., None]
    # backend="xla" on BOTH sides: the sharded call below goes through
    # _correlate_jit with statics=None (the field backend), so the unsharded
    # reference must use the same backend — this test measures sharding
    # parity, not cross-backend agreement (which has its own test with its
    # own tolerance in test_assemble.py).
    cfg = SolverConfig(
        model=FittingModel.UV,
        interpolation=Interpolation.BICUBIC,
        pyramid=PyramidConfig(0, 1, 1),
        precision=1e-5,
        backend="xla",
    )
    pts = [
        _grid(14 + 7 * i, 14 + 5 * (i % 3), 14 + 7 * i + 12,
              14 + 5 * (i % 3) + 12)
        for i in range(6)  # 6 subsets -> padded to 8 for the mesh
    ]
    batch = make_batch(pts, None, 1)
    params0 = np.zeros((6, 2), np.float32)

    ref = correlate(
        cfg,
        build_pyramid(jnp.asarray(und), 1),
        build_pyramid(jnp.asarray(dfm), 1),
        batch,
        params0,
    )

    mesh = make_mesh()
    padded = pad_to_mesh(batch, mesh)
    assert padded.num_subsets == 8
    params_pad = np.zeros((8, 2), np.float32)
    xy, mask, center0, p0 = shard_inputs(mesh, padded, params_pad)
    pyr_u = replicate(mesh, build_pyramid(jnp.asarray(und), 1))
    pyr_d = replicate(mesh, build_pyramid(jnp.asarray(dfm), 1))
    out = _correlate_jit(cfg, None, pyr_u, pyr_d, xy, mask, center0, p0)

    np.testing.assert_allclose(
        np.asarray(out.params)[:6], np.asarray(ref.params), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.chi)[:6], np.asarray(ref.chi), rtol=1e-5
    )
    # padding lanes resolve to BAD_DOMAIN frozen subsets
    assert np.all(np.asarray(out.error)[6:] != 0)


def test_pixel_sharded_assembly_matches():
    """BASELINE config 5: collective H/b reduction over a sharded pixel
    axis."""
    spk = Speckle(64, 64, seed=42)
    und = spk.image(quantize=True)[..., None]
    dfm = spk.warped_image(u=0.5, v=0.25, quantize=True)[..., None]
    model = FittingModel.AFFINE
    interp = Interpolation.BICUBIC

    pts = _grid(12, 12, 51, 51)  # 1600 px, divisible by 8
    xy = jnp.asarray(pts[None])
    mask = jnp.ones((1, len(pts)), bool)
    center = jnp.asarray(pts.mean(axis=0)[None])
    params = jnp.asarray([[0.5, 0.25, 0.001, 0, 0, -0.001]], jnp.float32)

    field = precompute_field(jnp.asarray(dfm), interp)
    und_w = sample_integer(jnp.asarray(und), xy)

    a1, b1, chi1, err1 = assemble_normal_equations(
        model, interp, field, und_w, xy, mask, center, params
    )

    pmesh = make_pixel_mesh()
    a2, b2, chi2, err2 = assemble_pixel_sharded(
        pmesh, model, interp, field, und_w, xy, mask, center, params
    )
    np.testing.assert_allclose(a2, a1, rtol=1e-5)
    np.testing.assert_allclose(b2, b1, rtol=1e-5)
    np.testing.assert_allclose(chi2, chi1, rtol=1e-6)
    assert bool(err2[0]) == bool(err1[0])


def test_correlate_mesh_argument_matches_unsharded():
    """The first-class mesh= path: pad/shard/strip handled internally."""
    spk = Speckle(80, 80, seed=13)
    und = spk.image(quantize=True)[..., None]
    dfm = spk.warped_image(u=0.7, v=0.3, quantize=True)[..., None]
    cfg = SolverConfig(
        model=FittingModel.UV,
        interpolation=Interpolation.BICUBIC,
        pyramid=PyramidConfig(0, 1, 1),
        precision=1e-5,
    )
    pts = [
        _grid(14 + 7 * i, 14 + 5 * (i % 3), 14 + 7 * i + 12,
              14 + 5 * (i % 3) + 12)
        for i in range(5)  # deliberately not divisible by 8
    ]
    batch = make_batch(pts, None, 1)
    params0 = np.zeros((5, 2), np.float32)
    pyr_u = build_pyramid(jnp.asarray(und), 1)
    pyr_d = build_pyramid(jnp.asarray(dfm), 1)

    ref = correlate(cfg, pyr_u, pyr_d, batch, params0)
    out = correlate(cfg, pyr_u, pyr_d, batch, params0, mesh=make_mesh())

    assert out.params.shape[0] == 5  # padding stripped
    np.testing.assert_allclose(
        np.asarray(out.params), np.asarray(ref.params), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.chi), np.asarray(ref.chi), rtol=1e-5
    )


def test_run_sequence_sharded_matches_unsharded():
    from correlation_tpu.config import (
        DeformationDescription,
        ReferenceImage,
    )
    from correlation_tpu.sequence import SequenceConfig, run_sequence

    spk = Speckle(80, 80, seed=5)
    frames = [
        spk.warped_image(u=0.5 * t, v=-0.3 * t, quantize=True)[..., None]
        for t in range(3)
    ]
    cfg = SequenceConfig(
        solver=SolverConfig(
            model=FittingModel.UV,
            interpolation=Interpolation.BICUBIC,
            pyramid=PyramidConfig(0, 1, 1),
            precision=1e-5,
        ),
        deformation=DeformationDescription.EULERIAN,
        reference=ReferenceImage.FIRST,
    )
    pts = [_grid(20, 20, 44, 44), _grid(40, 40, 64, 64)]

    ref = run_sequence(frames, pts, cfg)
    out = run_sequence(frames, pts, cfg, mesh=make_mesh())
    assert len(ref) == len(out) == 2
    for a, b in zip(ref, out):
        np.testing.assert_allclose(a.params, b.params, atol=2e-5)
        np.testing.assert_allclose(a.chi, b.chi, rtol=1e-5)


def test_init_distributed_noop_single_host(monkeypatch):
    from correlation_tpu.parallel.mesh import init_distributed

    for k in (
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
    ):
        monkeypatch.delenv(k, raising=False)
    assert init_distributed() is False


def test_init_distributed_two_process_cpu_mesh():
    """REAL jax.distributed initialization across two local processes
    (VERDICT r4 missing #1): each worker owns 4 virtual CPU devices,
    init_distributed forms the 8-device cluster, and the solve sharded
    over the cross-process mesh must match an unsharded reference on
    every addressable shard.  This is the only obtainable multi-host
    artifact on a single machine (SURVEY.md SS4(3))."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"DIST_OK {i}" in out, f"worker {i} output:\n{out}"


def test_run_sequence_lagrangian_sharded_matches_unsharded():
    """The round-5 Lagrangian chained scan under a mesh: the extra carry
    (per-sector integer offsets + chained centers) must shard with the
    subset axis and reproduce the unsharded run."""
    from correlation_tpu.config import (
        DeformationDescription,
        ReferenceImage,
    )
    from correlation_tpu.sequence import SequenceConfig, run_sequence

    spk = Speckle(112, 112, seed=6)
    frames = [
        spk.warped_image(u=1.2 * t, v=-0.9 * t, quantize=True)[..., None]
        for t in range(5)
    ]
    cfg = SequenceConfig(
        solver=SolverConfig(
            model=FittingModel.UV,
            interpolation=Interpolation.BICUBIC,
            pyramid=PyramidConfig(0, 1, 1),
            precision=1e-5,
        ),
        deformation=DeformationDescription.LAGRANGIAN,
        reference=ReferenceImage.PREVIOUS,
        frame_chunk=3,
    )
    pts = [_grid(28, 28, 52, 52), _grid(56, 56, 84, 84)]

    ref = run_sequence(frames, pts, cfg)
    out = run_sequence(frames, pts, cfg, mesh=make_mesh())
    assert len(ref) == len(out) == 4
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(a.error, b.error)
        np.testing.assert_allclose(a.params, b.params, atol=2e-5)
        np.testing.assert_allclose(a.und_center, b.und_center, atol=2e-5)
    # tracking sanity: each pair recovers ~(1.2, -0.9)
    np.testing.assert_allclose(
        ref[-1].params, [[1.2, -0.9]] * 2, atol=0.25
    )
