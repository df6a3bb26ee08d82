"""Probe: raw Pallas DMA rate for int8 vs int32-viewed weight blocks, and
convert-only VPU rate — pins down what caps the fused MoE kernel at 53%.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
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


def main():
    E, D, F = 16, 1024, 2816
    w8 = jax.random.randint(jax.random.PRNGKey(0), (E, D, F), -127, 127, jnp.int8)
    w32 = jax.random.randint(jax.random.PRNGKey(0), (E, D, F // 4), -2**30,
                             2**30, jnp.int32)
    wb = w8.astype(jnp.bfloat16)
    nbytes = E * D * F

    def reduce_kernel(op):
        def kern(w_ref, o_ref):
            e = pl.program_id(0)

            @pl.when(e == 0)
            def _():
                o_ref[...] = jnp.zeros_like(o_ref)

            x = w_ref[0]
            if op == "sum8":
                s = jnp.sum(x.astype(jnp.int32), axis=0, keepdims=True)
            elif op == "sum32":
                s = jnp.sum(x, axis=0, keepdims=True)
            elif op == "conv8":  # int8 -> bf16 convert then reduce (VPU rate)
                s = jnp.sum(x.astype(jnp.bfloat16), axis=0, keepdims=True,
                            dtype=jnp.float32)
            elif op == "sumbf":
                s = jnp.sum(x, axis=0, keepdims=True, dtype=jnp.float32)
            o_ref[...] += s[:, :128].astype(jnp.float32)
        return kern

    def run(w, op):
        shape = w.shape
        return pl.pallas_call(
            reduce_kernel(op),
            grid=(E,),
            in_specs=[pl.BlockSpec((1,) + shape[1:], lambda e: (e, 0, 0))],
            out_specs=pl.BlockSpec((1, 128), lambda e: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(w)

    def loop(w, op):
        @jax.jit
        def f(w):
            def b(i, acc):
                wi = w.at[(0,) * w.ndim].add(i.astype(w.dtype))
                return acc + run(wi, op).sum()
            return jax.lax.fori_loop(0, INNER, b, jnp.float32(0))
        return f

    for w, op, bytes_ in ((w8, "sum8", nbytes), (w8, "conv8", nbytes),
                          (w32, "sum32", nbytes), (wb, "sumbf", 2 * nbytes)):
        try:
            dt = timeit(loop(w, op), w)
            print(f"pallas {op:6s} ({w.dtype}): {dt*1e6:7.1f} us  "
                  f"{bytes_/dt/HBM*100:5.1f}% HBM", flush=True)
        except Exception as e:
            print(f"pallas {op:6s}: FAIL {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
