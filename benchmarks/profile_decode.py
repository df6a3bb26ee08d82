"""Decode-step component profile at bench_midsize shapes (TPU).

Times each hot component of one decode iteration in isolation (100 async
iters, one trailing sync — axon per-sync overhead is ~10-20 ms) and prints
a bytes/step + bandwidth-utilization line per component, so the roofline
gap in BENCH is attributable.

Run: python benchmarks/profile_decode.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819e9  # v5e


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def report(name, dt, nbytes):
    bw = nbytes / dt / HBM_GBPS * 100
    print(f"{name:42s} {dt*1e6:9.1f} us   {nbytes/1e6:8.1f} MB/step   "
          f"{bw:5.1f}% HBM")


def main():
    from vllm_from_scratch_tpu.models import moe as moe_mod
    from vllm_from_scratch_tpu.models.layers import QuantizedLinear, mm
    from vllm_from_scratch_tpu.ops.quant import quantize_int8

    # bench_midsize shapes
    B, D, F, E, K, L = 16, 1024, 2816, 16, 2, 12
    V, r, dr, dn, dv, H = 32000, 256, 32, 64, 64, 16
    ctx, bs, nblocks = 640, 16, 1024

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)

    # ---- MoE expert GEMMs (the 1.66 GB/step suspect) -----------------------
    def qlin(k, shape):
        w = 0.02 * jax.random.normal(k, shape)
        q, s = quantize_int8(w, axis=-2)
        return QuantizedLinear(q, s)

    wg = qlin(ks[0], (E, D, F))
    wu = qlin(ks[1], (E, D, F))
    wd = qlin(ks[2], (E, F, D))
    gate = 0.02 * jax.random.normal(ks[3], (D, E), jnp.bfloat16)
    x = jax.random.normal(ks[4], (B, D), jnp.bfloat16)
    moe_bytes = 3 * E * D * F  # int8

    @jax.jit
    def moe_step(x):
        out, _ = moe_mod.moe_ffn(x, gate, wg, wu, wd, top_k=K)
        return out

    report("moe_ffn (pallas fused, 1 layer)", timeit(moe_step, x), moe_bytes)

    os.environ["VFS_PALLAS"] = "0"

    @jax.jit
    def moe_step_xla(x):
        out, _ = moe_mod.moe_ffn(x, gate, wg, wu, wd, top_k=K)
        return out

    report("moe_ffn (xla ragged_dot, 1 layer)", timeit(moe_step_xla, x), moe_bytes)
    del os.environ["VFS_PALLAS"]

    # pure grouped-GEMM floor: all tokens to expert 0..E-1 evenly, bf16 dense
    xd = jax.random.normal(ks[5], (B * K, D), jnp.bfloat16)
    gs = jnp.full((E,), (B * K) // E, jnp.int32)

    from vllm_from_scratch_tpu.ops.pallas.moe_gemm import fused_moe_pallas

    @jax.jit
    def fused_only(xd):
        return fused_moe_pallas(xd, gs, wg, wu, wd)

    report("fused_moe_pallas kernel only", timeit(fused_only, xd), moe_bytes)

    # ---- MLA attention decode ---------------------------------------------
    from vllm_from_scratch_tpu.ops.mla_attention import (
        init_mla_cache, mla_paged_attention,
    )

    cache = init_mla_cache(nblocks, bs, r, dr, "int8", jnp.bfloat16)
    cache = cache._replace(
        c=jax.random.randint(ks[6], cache.c.shape, -127, 127, jnp.int8),
        kr=jax.random.randint(ks[7], cache.kr.shape, -127, 127, jnp.int8),
    )
    n_per = (ctx + bs - 1) // bs
    N = 64  # pow2 bucket
    tables = np.zeros((B, N), np.int32)
    used = np.random.RandomState(0).permutation(nblocks)[: B * n_per]
    tables[:, :n_per] = used.reshape(B, n_per)
    tables = jnp.asarray(tables)
    ctx_lens = jnp.full((B,), ctx, jnp.int32)
    q_lens = jnp.ones((B,), jnp.int32)
    qn = jax.random.normal(ks[8], (B, 1, H, dn), jnp.bfloat16)
    qr = jax.random.normal(ks[9], (B, 1, H, dr), jnp.bfloat16)
    w_uk = jax.random.normal(ks[10], (H, dn, r), jnp.bfloat16) * 0.02
    w_uv = jax.random.normal(ks[11], (H, r, dv), jnp.bfloat16) * 0.02
    attn_bytes = B * ctx * (r + dr + 8)  # int8 latents + scales actually read

    @jax.jit
    def attn_step(qn, qr):
        return mla_paged_attention(
            qn, qr, cache, tables, ctx_lens, q_lens, w_uk, w_uv,
            block_size=bs, sm_scale=(dn + dr) ** -0.5)

    report("mla_paged_attention (pallas, 1 layer)", timeit(attn_step, qn, qr),
           attn_bytes)

    @jax.jit
    def attn_step_xla(qn, qr):
        return mla_paged_attention(
            qn, qr, cache, tables, ctx_lens, q_lens, w_uk, w_uv,
            block_size=bs, sm_scale=(dn + dr) ** -0.5, allow_pallas=False)

    report("mla_paged_attention (xla, 1 layer)", timeit(attn_step_xla, qn, qr),
           attn_bytes)

    # ---- dense projections + lm_head ---------------------------------------
    lm = qlin(jax.random.PRNGKey(42), (D, V))
    xl = jax.random.normal(ks[4], (B, D), jnp.bfloat16)

    @jax.jit
    def lm_step(xl):
        return mm(xl, lm)

    report("lm_head int8 [16,1024]x[1024,32000]", timeit(lm_step, xl), D * V)

    # MLA projections per layer: q_a, q_b, kv_a, o_proj (int8)
    qd = H * (dn + dr)
    q_lora = D // 2
    proj_bytes = D * q_lora + q_lora * qd + D * (r + dr) + H * dv * D
    pa = qlin(jax.random.PRNGKey(1), (D, q_lora))
    pb = qlin(jax.random.PRNGKey(2), (q_lora, qd))
    pk = qlin(jax.random.PRNGKey(3), (D, r + dr))
    po = qlin(jax.random.PRNGKey(4), (H * dv, D))

    @jax.jit
    def proj_step(xl):
        a = mm(xl, pa)
        b = mm(a, pb)
        c = mm(xl, pk)
        o = mm(jnp.concatenate([b, c], -1)[:, : H * dv], po)
        return o

    report("mla projections int8 (1 layer)", timeit(proj_step, xl), proj_bytes)

    step_est = None
    print()
    print(f"ideal step (weights 1.9GB @ {HBM_GBPS/1e9:.0f}GB/s): "
          f"{3*E*D*F*L/HBM_GBPS*1e3 + (proj_bytes*L + D*V)/HBM_GBPS*1e3:.2f} ms")


if __name__ == "__main__":
    main()
