"""Sweep fused MoE kernel tilings at decode shapes (TPU). Run:
python -u benchmarks/sweep_moe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

HBM_GBPS = 819e9


def timeit(fn, *args, iters=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from vllm_from_scratch_tpu.models.layers import QuantizedLinear
    from vllm_from_scratch_tpu.models.moe import grouped_expert_ffn
    from vllm_from_scratch_tpu.ops.pallas.moe_gemm import fused_moe_pallas
    from vllm_from_scratch_tpu.ops.quant import quantize_int8
    from vllm_from_scratch_tpu.models.layers import dequantize_linear

    D, F, E = 1024, 2816, 16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)

    def qlin(k, shape):
        q, s = quantize_int8(0.02 * jax.random.normal(k, shape), axis=-2)
        return QuantizedLinear(q, s)

    wg, wu, wd = qlin(ks[0], (E, D, F)), qlin(ks[1], (E, D, F)), qlin(ks[2], (E, F, D))
    moe_bytes = 3 * E * D * F
    floor = moe_bytes / HBM_GBPS
    print(f"weights {moe_bytes/1e6:.0f} MB  DMA floor {floor*1e6:.0f} us")

    import itertools
    cases = [c.split(",") for c in (
        os.environ.get("SWEEP", "32:xla,32:32:256,32:32:1408,32:32:2816,32:128:1408")
        .split(","))]
    for case in [c for group in cases for c in group]:
        parts = case.split(":")
        M = int(parts[0])
        x = jax.random.normal(ks[3], (M, D), jnp.bfloat16)
        gs = jnp.full((E,), M // E, jnp.int32)
        if parts[1] == "xla":
            @jax.jit
            def xla_path(x):
                wgd = dequantize_linear(wg, x.dtype)
                wud = dequantize_linear(wu, x.dtype)
                wdd = dequantize_linear(wd, x.dtype)
                return grouped_expert_ffn(x, gs, wgd, wud, wdd)

            dt = timeit(xla_path, x)
            print(f"M={M:5d} xla ragged_dot           {dt*1e6:8.0f} us  "
                  f"{floor/dt*100:5.1f}% of floor", flush=True)
            continue
        tile_m, f_blk = int(parts[1]), int(parts[2])
        try:
            fn = jax.jit(lambda x, t=tile_m, f=f_blk: fused_moe_pallas(
                x, gs, wg, wu, wd, tile_m=t, f_block=f))
            dt = timeit(fn, x)
            print(f"M={M:5d} tile_m={tile_m:3d} f_blk={f_blk:4d}  "
                  f"{dt*1e6:8.0f} us  {floor/dt*100:5.1f}% of floor", flush=True)
        except Exception as e:
            print(f"M={M:5d} tile_m={tile_m:3d} f_blk={f_blk:4d}  "
                  f"FAIL {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
