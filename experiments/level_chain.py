"""Per-level chained-assembly cost with the ACTUAL bench statics.

For each pyramid level of the bench problem, runs N chained fused_assemble
calls inside one jit (serialized via a data dependency, mimicking the LM
while-loop) and prints ms/assembly.  Env overrides (CORRTPU_GRAM /
CORRTPU_SLACK / CORRTPU_GROUP / CORRTPU_BLOCK) flow through
compute_level_statics, so A/B runs are one env var away.

Usage: python experiments/level_chain.py [N_chain] [reps]
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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cfg, und_pyr, def_pyr, batch, params0, _raw = bench.build_problem(4096)
    backend = resolve_backend(cfg, 1)
    statics = dict(compute_level_statics(cfg, batch, def_pyr, backend))
    levels = jax.jit(
        lambda u, d: prepare_levels(
            cfg, u, d,
            [jnp.asarray(a) for a in batch.xy],
            [jnp.asarray(a) for a in batch.mask],
            jnp.asarray(batch.center0),
            statics,
        )
    )(und_pyr, def_pyr)

    for lvl in cfg.pyramid.levels_coarse_to_fine():
        st = statics[lvl]
        la = levels[lvl]
        p_lvl = translate_params(jnp.asarray(params0), 0, lvl)

        def body(i, carry, la=la, st=st):
            p, acc = carry
            out = v2.fused_assemble(
                cfg.model, cfg.interpolation, st.tile_h, st.tile_w,
                st.img_h, st.img_w, la.def_img, la.pixdata, la.center,
                p, la.bbox, st.block, img_prepared=True,
                tile_parts=st.parts, gram_mode=st.gram,
                row_slack=st.slack, group=st.group, sel_mode=st.sel,
                tile_src=st.tsrc,
            )
            p = p + 1e-9 * out.b_vec[:, : p.shape[1]]
            return p, acc + out.chi

        @jax.jit
        def run(p0, la=la, st=st, body=body):
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
        units = la.pixdata.shape[0]
        print(
            f"L{lvl}: {best*1e3:7.3f} ms/assembly  "
            f"({best/units*1e6:6.3f} us/unit, units={units}, "
            f"block={st.block}, group={st.group}, tile={st.tile_h}x"
            f"{st.tile_w}, parts={st.parts}, gram={st.gram}, "
            f"sel={st.sel}, tsrc={st.tsrc}, slack={st.slack})"
        )


if __name__ == "__main__":
    main()
