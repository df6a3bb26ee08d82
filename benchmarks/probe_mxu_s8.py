"""Probe: inside Pallas/Mosaic, does s8 x s8 -> s32 hit the MXU natively?

If yes, W8A8 in the fused MoE kernel removes the int8->bf16 VPU convert
that currently caps it at ~53% HBM.  Also probes the MLA attention kernel
at bigger page sizes (block_size 64/128) where DMA count drops 4-8x.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HBM = 819e9
INNER = 20


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / INNER


def make_gemm(mode, E, M, D, F):
    """Per-expert GEMM kernel: grid over E, one [M, D] @ [D, F]."""

    def kern(x_ref, w_ref, o_ref):
        if mode == "s8s8":
            acc = jax.lax.dot_general(
                x_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[...] = acc.astype(jnp.float32)
        elif mode == "bf16conv":
            acc = jax.lax.dot_general(
                x_ref[...].astype(jnp.bfloat16), w_ref[0].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            o_ref[...] = acc
        elif mode == "mixed":
            acc = jax.lax.dot_general(
                x_ref[...].astype(jnp.bfloat16), w_ref[0],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            o_ref[...] = acc

    def run(x, w):
        return pl.pallas_call(
            kern,
            grid=(E,),
            in_specs=[
                pl.BlockSpec((M, D), lambda e: (0, 0)),
                pl.BlockSpec((1, D, F), lambda e: (e, 0, 0)),
            ],
            out_specs=pl.BlockSpec((M, F), lambda e: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((M, F), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x, w)

    return run


def main():
    E, M, D, F = 16, 32, 1024, 2816
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    w8 = jax.random.randint(ks[0], (E, D, F), -127, 127, jnp.int8)
    x8 = jax.random.randint(ks[1], (M, D), -127, 127, jnp.int8)
    nbytes = E * D * F

    def loop(fn, x, w):
        @jax.jit
        def f(x):
            def b(i, acc):
                xi = x.at[0, 0].add(i.astype(x.dtype))
                return acc + fn(xi, w).sum()
            return jax.lax.fori_loop(0, INNER, b, jnp.float32(0))
        return f

    for mode in ("s8s8", "mixed", "bf16conv"):
        try:
            fn = make_gemm(mode, E, M, D, F)
            dt = timeit(loop(fn, x8, w8), x8)
            print(f"pallas gemm {mode:9s}: {dt*1e6:7.1f} us  "
                  f"{nbytes/dt/HBM*100:5.1f}% HBM", flush=True)
        except Exception as e:
            print(f"pallas gemm {mode:9s}: FAIL {str(e)[:150]}", flush=True)

    # ---- MLA attention at bigger pages ----
    from vllm_from_scratch_tpu.ops.mla_attention import (
        init_mla_cache, mla_paged_attention,
    )

    B, r, dr, dn, dv, H = 16, 256, 32, 64, 64, 16
    ctx = 640
    for bs in (16, 64, 128):
        nblocks = 16384 // bs
        cache = init_mla_cache(nblocks, bs, r, dr, "int8", jnp.bfloat16)
        cache = cache._replace(
            c=jax.random.randint(ks[2], cache.c.shape, -127, 127, jnp.int8),
            kr=jax.random.randint(ks[3], cache.kr.shape, -127, 127, jnp.int8))
        n_per = -(-ctx // bs)
        N = max(4, 1 << (n_per - 1).bit_length())
        tables = np.zeros((B, N), np.int32)
        tables[:, :n_per] = np.random.RandomState(0).permutation(
            nblocks - 1)[: B * n_per].reshape(B, n_per) + 1
        tables = jnp.asarray(tables)
        ctxl = jnp.full((B,), ctx, jnp.int32)
        qlen = jnp.ones((B,), jnp.int32)
        w_uk = 0.02 * jax.random.normal(ks[2], (H, dn, r), jnp.bfloat16)
        w_uv = 0.02 * jax.random.normal(ks[3], (H, r, dv), jnp.bfloat16)
        qn = jax.random.normal(ks[1], (B, 1, H, dn), jnp.bfloat16)

        def att(qni):
            qr = qni[..., :dr]
            return mla_paged_attention(
                qni, qr, cache, tables, ctxl, qlen, w_uk, w_uv,
                block_size=bs, sm_scale=(dn + dr) ** -0.5).sum()

        @jax.jit
        def f(x):
            def bdy(i, acc):
                xi = x + (i.astype(x.dtype) * jnp.asarray(1e-8, x.dtype))
                return acc + att(xi).astype(jnp.float32)
            return jax.lax.fori_loop(0, INNER, bdy, jnp.float32(0))

        dt = timeit(f, qn)
        print(f"mla attention bs={bs:3d}: {dt*1e6:7.1f} us/layer", flush=True)


if __name__ == "__main__":
    main()
