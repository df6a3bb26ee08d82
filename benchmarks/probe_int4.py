"""INT4 vs INT8 fused MoE expert kernel at the midsize engine shape (TPU).

Answers the VERDICT r2 #8 question: does halving the expert-weight HBM
stream (INT4 nibbles, in-kernel unpack) beat the measured ~430 GB/s
int8-upconvert cap, or is the cap per-ELEMENT (convert-throughput) so INT4
gains nothing?  Measures the layer-scan the engine actually runs: 12
layer-stacked expert sets selected in-kernel, outputs chained so the scan
is sequential, one jitted call (CLAUDE.md measurement rules).

Run: python benchmarks/probe_int4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

L, E, D, F = 12, 16, 1024, 2816
HBM_GBPS = 819e9


def make_weights(kind: str):
    from vllm_from_scratch_tpu.models.layers import (
        QuantizedLinear, quantize_linear4_half_in, quantize_linear4_half_out,
    )
    from vllm_from_scratch_tpu.ops.quant import quantize_int8

    k = jax.random.PRNGKey(0)
    kg, ku, kd = jax.random.split(k, 3)
    g = 0.02 * jax.random.normal(kg, (L, E, D, F))
    u = 0.02 * jax.random.normal(ku, (L, E, D, F))
    d = 0.02 * jax.random.normal(kd, (L, E, F, D))
    if kind == "int8":
        def q8(w):
            q, s = quantize_int8(w, axis=-2)
            return QuantizedLinear(q, s)
        return q8(g), q8(u), q8(d)
    return (quantize_linear4_half_in(g), quantize_linear4_half_in(u),
            quantize_linear4_half_out(d))


def bytes_of(ws):
    return sum(x.size * x.dtype.itemsize
               for w in ws for x in jax.tree.leaves(w))


def measure(kind: str, M: int, reps: int = 8):
    from vllm_from_scratch_tpu.ops.pallas.moe_gemm import fused_moe_pallas

    wg, wu, wd = make_weights(kind)
    total = bytes_of((wg, wu, wd))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (M, D), jnp.bfloat16)
    gs = jnp.full((E,), M // E, jnp.int32)

    def layer_scan(x):
        def body(x, li):
            y = fused_moe_pallas(x, gs, wg, wu, wd, layer_idx=li)
            return y.astype(jnp.bfloat16), ()
        x, _ = jax.lax.scan(body, x, jnp.arange(L))
        return x

    @jax.jit
    def run(x):
        def body(x, _):
            return layer_scan(x), ()
        x, _ = jax.lax.scan(body, x, None, length=reps)
        return x

    out = run(x0)
    jax.block_until_ready(out)          # compile + warm
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    eff = total / dt / 1e9
    print(f"{kind:5s} M={M:<5d} {1000*dt:7.3f} ms/12-layer-step  "
          f"weights {total/1e6:6.0f} MB  -> {eff:5.0f} GB/s effective  "
          f"({100*total/dt/HBM_GBPS:4.1f}% of HBM roofline)", flush=True)
    return dt


def main():
    print(f"midsize expert stacks: L={L} E={E} D={D} F={F}", flush=True)
    for M in (32, 2048):
        t8 = measure("int8", M)
        t4 = measure("int4", M)
        print(f"      M={M}: int4 is {t8/t4:.2f}x vs int8", flush=True)


if __name__ == "__main__":
    main()
