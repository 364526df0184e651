"""Per-phase wall-time breakdown of the bench.py workload (PERF.md source).

Times, at the exact bench shapes (4096 subsets, 21x21 px, affine, bicubic,
3-level pyramid, 8 fixed iterations):
  - full correlate (the bench number)
  - prepare_levels (per-frame, iteration-invariant work)
  - solve_level per pyramid level (jit'd separately)
  - chained fused assembly per level's real shapes
  - lm_delta (batched Cholesky) alone
  - while-loop bookkeeping (solve_level with assembly stubbed to zeros)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_problem
from correlation_tpu import engine
from correlation_tpu.engine import (
    LevelStatic,
    compute_level_statics,
    correlate,
    prepare_levels,
    solve_level,
)
from correlation_tpu.ops.solve import lm_delta


def timeit(fn, reps=10):
    out = fn()
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
    return (time.perf_counter() - t0) / reps


def main():
    num_subsets = 4096
    cfg, und_pyr, def_pyr, batch, params0, _raw = build_problem(num_subsets)
    statics = compute_level_statics(cfg, batch, def_pyr, "pallas")
    statics_d = dict(statics)
    print("statics:", statics_d)

    t_total = timeit(
        lambda: correlate(cfg, und_pyr, def_pyr, batch, params0), reps=5
    )
    print(f"total correlate:        {t_total*1e3:9.3f} ms")

    prep = jax.jit(
        lambda: prepare_levels(
            cfg, und_pyr, def_pyr, batch.xy, batch.mask,
            jnp.asarray(batch.center0), statics_d,
        )
    )
    t_prep = timeit(prep)
    print(f"prepare_levels:         {t_prep*1e3:9.3f} ms")

    levels = prep()
    schedule = cfg.pyramid.levels_coarse_to_fine()

    from correlation_tpu.models.warp import translate_params

    t_levels = {}
    res_by_level = {}
    p = jnp.asarray(params0)
    prev = 0
    skip = jnp.zeros((num_subsets,), bool)
    for lvl in schedule:
        p_l = translate_params(p, prev, lvl)
        f = jax.jit(
            lambda pl_, lvl=lvl: solve_level(
                cfg, levels[lvl], pl_, skip, statics_d[lvl]
            )
        )
        t_levels[lvl] = timeit(lambda: f(p_l), reps=5)
        res = f(p_l)
        res_by_level[lvl] = res
        print(
            f"solve_level L{lvl}:       {t_levels[lvl]*1e3:9.3f} ms  "
            f"(iters reached: {np.asarray(res.reached).mean():.2f})"
        )
        p = jnp.where(~res.init_fail[:, None], res.params, p_l)
        prev = lvl

    # chained assembly per level
    from correlation_tpu.ops import assemble_v2 as v2

    for lvl in schedule:
        la = levels[lvl]
        st = statics_d[lvl]
        pl_shape = translate_params(jnp.asarray(params0), 0, lvl)

        def chain(p0, lvl=lvl, la=la, st=st, n=20):
            def body(i, carry):
                pp, acc = carry
                out = v2.fused_assemble(
                    cfg.model, cfg.interpolation, st.tile_h, st.tile_w,
                    st.img_h, st.img_w, la.def_img, la.pixdata, la.center,
                    pp, la.bbox, st.block, img_prepared=True,
                    tile_parts=st.parts, gram_mode=st.gram,
                    row_slack=st.slack, group=st.group,
                )
                pp = pp + 1e-9 * out.b_vec
                return pp, acc + out.chi

            return jax.lax.fori_loop(
                0, 20, body, (p0, jnp.zeros(num_subsets, jnp.float32))
            )

        cf = jax.jit(chain)
        t = timeit(lambda: cf(pl_shape), reps=3) / 20
        print(f"assembly L{lvl} (chained): {t*1e3:9.3f} ms/assembly")

    # lm_delta alone, chained
    a = jnp.tile(jnp.eye(6, dtype=jnp.float32)[None], (num_subsets, 1, 1)) * 50
    b = jnp.ones((num_subsets, 6), jnp.float32)
    lam = jnp.full((num_subsets,), 1e-4, jnp.float32)
    scal = jnp.full((num_subsets,), 1.0 / 441, jnp.float32)

    def chain_lm(b0):
        def body(i, bb):
            dp = lm_delta(a, bb, lam, scal)
            return bb + 1e-9 * dp

        return jax.lax.fori_loop(0, 50, body, b0)

    t_lm = timeit(lambda: jax.jit(chain_lm)(b), reps=3) / 50
    print(f"lm_delta (chained):     {t_lm*1e3:9.3f} ms/call")

    # bookkeeping: stub the assembly with a cheap fake
    real_assemble = None

    import correlation_tpu.ops.assemble_v2 as v2mod

    orig = v2mod.fused_assemble

    def fake(model, interp, th, tw, ih, iw, img, pixdata, center, params,
             bbox, block=16, **kwargs):
        s = params.shape[0]
        npar = params.shape[1]
        a = jnp.tile(jnp.eye(npar, dtype=jnp.float32)[None], (s, 1, 1))
        bb = jnp.sum(params, -1, keepdims=True) * jnp.ones((s, npar))
        chi = jnp.sum(params**2, -1) + 1.0
        err = jnp.zeros((s,), bool)
        return v2.FusedAssembly(a, bb, chi, err)

    v2mod.fused_assemble = fake
    engine_solve = jax.jit(
        lambda pl_: solve_level(cfg, levels[0], pl_, skip, statics_d[0])
    )
    try:
        t_book = timeit(lambda: engine_solve(jnp.asarray(params0)), reps=5)
    finally:
        v2mod.fused_assemble = orig
    print(f"solve_level L0 w/ stub assembly: {t_book*1e3:9.3f} ms")


if __name__ == "__main__":
    main()
