"""Isolate the cost structure of the v2 kernel's per-subset matmuls.

Variants, each over a grid of G steps (mimicking the assembly grid):
  loop:    B separate [K, M] x [K, P] dot_generals per step (current v2)
  batched: one dot_general with a batch dim per step
  gram_loop/gram_batch: the [8, P] Gram per subset, loop vs one [8B, P]
  vpu:     the kernel's VPU stages alone (no matmuls)
  dma:     DMA fetch + roll only
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, M, P = 8, 120, 128, 512
G = 256


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out)[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out)[:1]
    return (time.perf_counter() - t0) / reps


def run(name, kernel, in_shapes, out_shape, scratch=None, dtype=None):
    dtype = dtype or jnp.float32
    ins = [
        jnp.asarray(np.random.default_rng(i).standard_normal(s) * 0.1,
                    dtype)
        for i, s in enumerate(in_shapes)
    ]
    f = jax.jit(
        lambda *a: pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec(
                    (1,) + s[1:], lambda i: (i,) + (0,) * (len(s) - 1),
                    memory_space=pltpu.VMEM,
                )
                for s in in_shapes
            ],
            out_specs=pl.BlockSpec(
                (1,) + out_shape[1:],
                lambda i: (i,) + (0,) * (len(out_shape) - 1),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            scratch_shapes=scratch or [],
        )(*a)
    )
    dt = timeit(f, *ins)
    print(f"{name:12s}: {dt*1e3:8.3f} ms total, {dt/G*1e6:8.2f} us/step")


def main():
    which = sys.argv[1:] or ["loop", "batched", "gram", "vpu"]

    if "loop" in which:
        def k_loop(a_ref, o_ref, out_ref):
            for b in range(B):
                out_ref[0, b] = jax.lax.dot_general(
                    a_ref[0, b], o_ref[0, b],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        run("loop", k_loop, [(G, B, K, M), (G, B, K, P)], (G, B, M, P),
            dtype=jnp.bfloat16)

    if "batched" in which:
        def k_batch(a_ref, o_ref, out_ref):
            out_ref[0] = jax.lax.dot_general(
                a_ref[0], o_ref[0],
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        run("batched", k_batch, [(G, B, K, M), (G, B, K, P)], (G, B, M, P),
            dtype=jnp.bfloat16)

    if "gram" in which:
        def k_gram_loop(g_ref, out_ref):
            for b in range(B):
                out_ref[0, b] = jax.lax.dot_general(
                    g_ref[0, b], g_ref[0, b],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        run("gram_loop", k_gram_loop, [(G, B, 8, P)], (G, B, 8, 8))

        def k_gram_big(g_ref, out_ref):
            g = g_ref[0].reshape(B * 8, P)
            big = jax.lax.dot_general(
                g, g,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for b in range(B):
                out_ref[0, b] = big[8 * b : 8 * b + 8, 8 * b : 8 * b + 8]

        run("gram_big", k_gram_big, [(G, B, 8, P)], (G, B, 8, 8))

    if "vpu" in which:
        # the column-weight + 3 mult-reduce stages at v2 shapes
        TW = 32

        def k_vpu(sel_ref, rx_ref, out_ref):
            sel = sel_ref[0]  # [B, 4*TW, P]
            rx = rx_ref[0]  # [B, 1, P] (pretend)
            c_sub = jax.lax.broadcasted_iota(jnp.int32, (B, TW, P), 1)
            d = c_sub - rx.astype(jnp.int32)
            w_col = jnp.zeros((B, TW, P), jnp.float32)
            w_col_d = jnp.zeros((B, TW, P), jnp.float32)
            for kk in range(4):
                m = (d == kk).astype(jnp.float32)
                w_col = w_col + m * 0.3
                w_col_d = w_col_d + m * 0.1
            tmp = sel[:, 0:TW, :]
            tmp_d = sel[:, TW : 2 * TW, :]
            for j in range(1, 4):
                tmp = tmp + 0.25 * sel[:, j * TW : (j + 1) * TW, :]
                tmp_d = tmp_d + 0.1 * sel[:, j * TW : (j + 1) * TW, :]
            w_v = jnp.sum(w_col * tmp, axis=1)
            dwdx = jnp.sum(w_col_d * tmp, axis=1)
            dwdy = jnp.sum(w_col * tmp_d, axis=1)
            out_ref[0] = jnp.stack([w_v, dwdx, dwdy], axis=1)

        run("vpu", k_vpu, [(G, B, 4 * TW, P), (G, B, 1, P)], (G, B, 3, P))


if __name__ == "__main__":
    main()
