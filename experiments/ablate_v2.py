"""Stage-cost ablation of the LIVE fused kernel (no fork).

Runs chained assemblies per pyramid level of the bench problem with the
kernel truncated at successive stages (fused_assemble's `ablate` hook) and
prints the marginal cost of each stage.  Replaces the old standalone
kernel fork — this drives ops/assemble_v2.py directly, so it cannot rot.

Stages: tiles_only (tile slice/roll/stack), to_sel (+warp/onehot/selection
matmul), to_sample (+tap combination, column weights, sample
contractions), to_interp (+H rows / G stack), "" = full (+Gram +
extraction).

Usage: python experiments/ablate_v2.py [N_chain] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from correlation_tpu.engine import (
    compute_level_statics,
    prepare_levels,
    resolve_backend,
)
from correlation_tpu.models.warp import translate_params
from correlation_tpu.ops import assemble_v2 as v2

STAGES = ["stub", "tiles_only", "zero_tiles", "to_sel", "to_sample",
          "to_interp", ""]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cfg, und_pyr, def_pyr, batch, params0, _raw = bench.build_problem(4096)
    backend = resolve_backend(cfg, 1)
    statics = dict(compute_level_statics(cfg, batch, def_pyr, backend))
    levels = prepare_levels(
        cfg, und_pyr, def_pyr,
        [jnp.asarray(a) for a in batch.xy],
        [jnp.asarray(a) for a in batch.mask],
        jnp.asarray(batch.center0), statics,
    )

    for lvl in cfg.pyramid.levels_coarse_to_fine():
        st = statics[lvl]
        la = levels[lvl]
        p_lvl = translate_params(jnp.asarray(params0), 0, lvl)
        units = la.pixdata.shape[0]
        print(
            f"L{lvl}: units={units} block={st.block} group={st.group} "
            f"tile={st.tile_h}x{st.tile_w} tsrc={st.tsrc}"
        )
        prev = 0.0
        for stage in STAGES:

            def body(i, carry, la=la, st=st, stage=stage):
                p, acc = carry
                out = v2.fused_assemble(
                    cfg.model, cfg.interpolation, st.tile_h, st.tile_w,
                    st.img_h, st.img_w, la.def_img, la.pixdata, la.center,
                    p, la.bbox, st.block, img_prepared=True,
                    tile_parts=st.parts, gram_mode=st.gram,
                    row_slack=st.slack, group=st.group, sel_mode=st.sel,
                    tile_src=st.tsrc, ablate=stage,
                )
                p = p + 1e-12 * out.chi[: p.shape[0], None]
                return p, acc + out.chi

            @jax.jit
            def run(p0, body=body):
                return jax.lax.fori_loop(
                    0, n, body, (p0, jnp.zeros(p0.shape[0], jnp.float32))
                )

            out = run(p_lvl)
            jax.block_until_ready(out)
            np.asarray(out[1][:1])
            best = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                out = run(p_lvl)
                jax.block_until_ready(out)
                np.asarray(out[1][:1])
                best = min(best, (time.perf_counter() - t0) / n)
            name = stage or "full"
            marg = best * 1e3 - prev if stage != "zero_tiles" else 0.0
            extra = (
                "" if stage == "zero_tiles"
                else f"  (+{marg:6.3f})"
            )
            print(
                f"  {name:11s}: {best*1e3:7.3f} ms/assembly"
                f" ({best/units*1e6:6.3f} us/unit){extra}"
            )
            if stage != "zero_tiles":
                prev = best * 1e3


if __name__ == "__main__":
    main()
