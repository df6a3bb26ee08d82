"""Probe: MXU-native int8 x int8 matmul vs bf16-converted int8 weights.

Hypothesis from probe_bw: int8->bf16 upconvert runs on the VPU at ~150G
elem/s, capping every weight-int8 matmul at ~150 GB/s effective.  A native
s8 x s8 -> s32 MXU matmul should stream weights at HBM speed.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

HBM = 819e9
INNER = 20


def timeit_async(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    E, D, F, M = 16, 1024, 2816, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    w8 = jax.random.randint(ks[0], (E, D, F), -127, 127, jnp.int8)
    x8 = jax.random.randint(ks[1], (E, M, D), -127, 127, jnp.int8)
    xb = jax.random.normal(ks[2], (E, M, D), jnp.bfloat16)
    nbytes = E * D * F

    def looped(body):
        @jax.jit
        def f(x):
            def b(i, acc):
                xi = x.at[(0,) * x.ndim].add(i.astype(x.dtype))
                return acc + body(xi).astype(jnp.float32)
            return jax.lax.fori_loop(0, INNER, b, jnp.float32(0))
        return f

    dn = (((2,), (1,)), ((0,), (0,)))  # batched over E, contract D

    f = looped(lambda x8: jax.lax.dot_general(
        x8, w8, dn, preferred_element_type=jnp.int32).sum())
    dt = timeit_async(f, x8) / INNER
    print(f"s8 x s8 -> s32 batched dot:   {dt*1e6:8.1f} us  "
          f"{nbytes/dt/HBM*100:5.1f}% HBM", flush=True)

    f = looped(lambda xb: jax.lax.dot_general(
        xb, w8.astype(jnp.bfloat16), dn,
        preferred_element_type=jnp.float32).sum())
    dt = timeit_async(f, xb) / INNER
    print(f"bf16 x convert(s8) dot:       {dt*1e6:8.1f} us  "
          f"{nbytes/dt/HBM*100:5.1f}% HBM", flush=True)

    wb = w8.astype(jnp.bfloat16)  # resident bf16 copy (2x bytes)
    f = looped(lambda xb: jax.lax.dot_general(
        xb, wb, dn, preferred_element_type=jnp.float32).sum())
    dt = timeit_async(f, xb) / INNER
    print(f"bf16 x bf16(resident) dot:    {dt*1e6:8.1f} us  "
          f"{2*nbytes/dt/HBM*100:5.1f}% HBM (2x bytes)", flush=True)


if __name__ == "__main__":
    main()
