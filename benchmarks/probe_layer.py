"""Per-component decode-step budget at bench_midsize shapes, measured
inside fori_loops (engine-scan conditions).  Run: python -u benchmarks/probe_layer.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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


def main():
    from vllm_from_scratch_tpu.models.layers import QuantizedLinear, mm, rms_norm
    from vllm_from_scratch_tpu.models import moe as moe_mod
    from vllm_from_scratch_tpu.ops.quant import quantize_int8
    from vllm_from_scratch_tpu.ops.mla_attention import (
        init_mla_cache, mla_paged_attention,
    )

    B, D, F, E, K = 16, 1024, 2816, 16, 2
    V, r, dr, dn, dv, H, L = 32000, 256, 32, 64, 64, 16, 12
    ctx, bs, nblocks = 640, 16, 1024
    qlora = H * (dn + dr) // 4  # 384

    ks = jax.random.split(jax.random.PRNGKey(0), 20)

    def qlin(k, shape):
        q, s = quantize_int8(0.02 * jax.random.normal(k, shape), axis=-2)
        return QuantizedLinear(q, s)

    def loop(body):
        @jax.jit
        def f(x):
            def b(i, acc):
                xi = x + (i.astype(x.dtype) * jnp.asarray(1e-8, x.dtype))
                return acc + body(xi).astype(jnp.float32)
            return jax.lax.fori_loop(0, INNER, b, jnp.float32(0))
        return f

    x = jax.random.normal(ks[0], (B, D), jnp.bfloat16)

    # --- MoE layer (routing + fused kernel + shared expert) ---
    gate = 0.02 * jax.random.normal(ks[1], (D, E), jnp.float32)
    wg, wu, wd = qlin(ks[2], (E, D, F)), qlin(ks[3], (E, D, F)), qlin(ks[4], (E, F, D))
    shared = tuple(qlin(k, s) for k, s in zip(
        jax.random.split(ks[5], 3), ((D, F), (D, F), (F, D))))
    moe_bytes = 3 * E * D * F + 3 * D * F

    def moe_body(xi):
        out, _ = moe_mod.moe_ffn(xi, gate, wg, wu, wd, top_k=K, shared=shared)
        return out.sum()

    dt = timeit(loop(moe_body), x)
    print(f"moe layer (w/ shared+routing): {dt*1e6:7.1f} us x{L} = "
          f"{dt*L*1e3:6.2f} ms  ({moe_bytes/dt/HBM*100:.0f}% HBM)", flush=True)

    # --- MLA attention block decode ---
    cache = init_mla_cache(nblocks, bs, r, dr, "int8", jnp.bfloat16)
    cache = cache._replace(
        c=jax.random.randint(ks[6], cache.c.shape, -127, 127, jnp.int8),
        kr=jax.random.randint(ks[7], cache.kr.shape, -127, 127, jnp.int8))
    n_per = ctx // bs
    tables = np.zeros((B, 64), np.int32)
    tables[:, :n_per] = np.random.RandomState(0).permutation(
        nblocks - 1)[: B * n_per].reshape(B, n_per) + 1
    tables = jnp.asarray(tables)
    ctxl = jnp.full((B,), ctx, jnp.int32)
    ql = jnp.ones((B,), jnp.int32)
    w_uk = 0.02 * jax.random.normal(ks[8], (H, dn, r), jnp.bfloat16)
    w_uv = 0.02 * jax.random.normal(ks[9], (H, r, dv), jnp.bfloat16)
    qn = jax.random.normal(ks[10], (B, 1, H, dn), jnp.bfloat16)
    att_bytes = B * ctx * (r + dr + 8)

    def att_body(qni):
        qr = qni[..., :dr]
        return mla_paged_attention(
            qni, qr, cache, tables, ctxl, ql, w_uk, w_uv,
            block_size=bs, sm_scale=(dn + dr) ** -0.5).sum()

    dt = timeit(loop(att_body), qn)
    print(f"mla attention (pallas path):   {dt*1e6:7.1f} us x{L} = "
          f"{dt*L*1e3:6.2f} ms  ({att_bytes/dt/HBM*100:.0f}% HBM)", flush=True)

    os.environ["VFS_PALLAS"] = "0"
    dt = timeit(loop(att_body), qn)
    del os.environ["VFS_PALLAS"]
    print(f"mla attention (xla path):      {dt*1e6:7.1f} us x{L} = "
          f"{dt*L*1e3:6.2f} ms", flush=True)

    # --- dense projections per layer ---
    q_a = qlin(ks[11], (D, qlora))
    q_b = qlin(ks[12], (qlora, H * (dn + dr)))
    kv_a = qlin(ks[13], (D, r + dr))
    wo = qlin(ks[14], (H * dv, D))
    proj_bytes = D * qlora + qlora * H * (dn + dr) + D * (r + dr) + H * dv * D

    def proj_body(xi):
        a = mm(xi, q_a)
        b = mm(a, q_b)
        c = mm(xi, kv_a)
        o = mm(b[:, : H * dv], wo)
        return (o + c[:, :1]).sum()

    dt = timeit(loop(proj_body), x)
    print(f"mla projections int8:          {dt*1e6:7.1f} us x{L} = "
          f"{dt*L*1e3:6.2f} ms  ({proj_bytes/dt/HBM*100:.0f}% HBM)", flush=True)

    # --- lm_head + sample ---
    lm = qlin(ks[15], (D, V))

    def lm_body(xi):
        logits = mm(xi, lm).astype(jnp.float32)
        return jnp.max(logits)

    dt = timeit(loop(lm_body), x)
    print(f"lm_head int8 [16x1024x32000]:  {dt*1e6:7.1f} us x1  "
          f"({D*V/dt/HBM*100:.0f}% HBM)", flush=True)


if __name__ == "__main__":
    main()
