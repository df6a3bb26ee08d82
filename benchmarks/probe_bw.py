"""Separate per-dispatch overhead from real kernel time (TPU probe).

Times each candidate inside a 20-iteration lax.fori_loop in ONE device call
(zero dispatch overhead) vs the async-loop method, plus a pure HBM
reduction and a trivial op as floors.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

HBM = 819e9
INNER = 20


def timeit_async(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from vllm_from_scratch_tpu.models.layers import QuantizedLinear
    from vllm_from_scratch_tpu.ops.pallas.moe_gemm import fused_moe_pallas
    from vllm_from_scratch_tpu.ops.quant import quantize_int8

    D, F, E, M = 1024, 2816, 16, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 5)

    def qlin(k, shape):
        q, s = quantize_int8(0.02 * jax.random.normal(k, shape), axis=-2)
        return QuantizedLinear(q, s)

    wg, wu, wd = qlin(ks[0], (E, D, F)), qlin(ks[1], (E, D, F)), qlin(ks[2], (E, F, D))
    x = jax.random.normal(ks[3], (M, D), jnp.bfloat16)
    gs = jnp.full((E,), M // E, jnp.int32)
    moe_bytes = 3 * E * D * F

    # 0) trivial op: measures per-dispatch floor of the async method
    @jax.jit
    def triv(x):
        return x + 1

    print(f"trivial op async/dispatch floor: {timeit_async(triv, x)*1e6:8.1f} us",
          flush=True)

    # 1) pure HBM read: sum all expert weights
    @jax.jit
    def hbm_read(b):
        s = (jnp.sum(wg.q, dtype=jnp.int32) + jnp.sum(wu.q, dtype=jnp.int32)
             + jnp.sum(wd.q, dtype=jnp.int32))
        return s + b

    dt = timeit_async(hbm_read, jnp.int32(0))
    print(f"hbm reduce-sum {moe_bytes/1e6:.0f}MB: {dt*1e6:8.1f} us  "
          f"{moe_bytes/dt/HBM*100:5.1f}% HBM", flush=True)

    # 2) fused kernel inside fori_loop (no dispatch overhead)
    def loop_of(fn):
        @jax.jit
        def looped(x):
            def body(i, acc):
                xi = x + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
                return acc + fn(xi).sum()
            return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))
        return looped

    for tm, fb in ((32, 2816), (32, 1408), (32, 256)):
        fn = loop_of(lambda xi, t=tm, f=fb: fused_moe_pallas(
            xi, gs, wg, wu, wd, tile_m=t, f_block=f))
        dt = timeit_async(fn, x, iters=10) / INNER
        print(f"fused_moe tile_m={tm} f={fb} (looped): {dt*1e6:8.1f} us  "
              f"{moe_bytes/dt/HBM*100:5.1f}% HBM", flush=True)

    # 3) XLA int8->bf16 batched dense matmul, same bytes (roofline probe)
    xe = jnp.broadcast_to(x[:2], (E, 2, D)).astype(jnp.bfloat16)

    @jax.jit
    def xla_batched(xe):
        def body(i, acc):
            xi = xe + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            g = jnp.einsum("eid,edf->eif", xi, wg.q.astype(jnp.bfloat16))
            u = jnp.einsum("eid,edf->eif", xi, wu.q.astype(jnp.bfloat16))
            y = jnp.einsum("eif,efd->eid", jax.nn.silu(g) * u,
                           wd.q.astype(jnp.bfloat16))
            return acc + y.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    dt = timeit_async(xla_batched, xe, iters=10) / INNER
    print(f"xla batched int8 experts (looped): {dt*1e6:8.1f} us  "
          f"{moe_bytes/dt/HBM*100:5.1f}% HBM", flush=True)


if __name__ == "__main__":
    main()
