"""Shared functional layers: RMSNorm and SwiGLU MLP over param pytrees.

Equivalents of the reference's nn.Module layers (RMSNorm at
05_mini_vllm/mini_vllm.py:344-352, SwiGLU FFN at :490-513, Expert at
03_moe/mini_moe.py:25-36) as pure functions: params in, activations out —
the idiomatic JAX shape, so layers compose under jit / scan / shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """x * rsqrt(mean(x^2) + eps) * weight, computed in fp32."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def swiglu(x: jax.Array, w_gate: jax.Array, w_up: jax.Array, w_down: jax.Array) -> jax.Array:
    """down(silu(x @ gate) * (x @ up)) — bias-free, LLaMA/DeepSeek style."""
    g = jax.nn.silu(x @ w_gate)
    return (g * (x @ w_up)) @ w_down


def init_linear(key, d_in: int, d_out: int, dtype=jnp.float32, scale: float = 0.02):
    return (scale * jax.random.normal(key, (d_in, d_out))).astype(dtype)
