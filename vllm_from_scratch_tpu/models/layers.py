"""Shared functional layers: RMSNorm and SwiGLU MLP over param pytrees.

Equivalents of the reference's nn.Module layers (RMSNorm at
05_mini_vllm/mini_vllm.py:344-352, SwiGLU FFN at :490-513, Expert at
03_moe/mini_moe.py:25-36) as pure functions: params in, activations out —
the idiomatic JAX shape, so layers compose under jit / scan / shard_map.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp


class QuantizedLinear(NamedTuple):
    """Weight-only INT8 linear: (int8 weights, per-output-channel scales).

    Supports stacked leading axes ([L, in, out] / [L, E, in, out]) — as a
    NamedTuple it is a pytree, so lax.scan slices q and scale together.
    """

    q: jax.Array       # int8 [..., in, out]
    scale: jax.Array   # f32  [..., out]


@jax.tree_util.register_pytree_node_class
class QuantizedLinear4:
    """Weight-only INT4: two nibbles packed per int8 along the input axis.

    q4[..., i, o] holds rows 2i (low nibble) and 2i+1 (high nibble) as
    offset-8 unsigned nibbles; scale is per-output-channel like INT8.
    ``in_dim`` (the unpacked input size) is pytree aux data — NOT a leaf —
    so lax.scan / device_put only see the two arrays.
    """

    def __init__(self, q4: jax.Array, scale: jax.Array, in_dim: int):
        self.q4 = q4       # int8 [..., ceil(in/2), out] (two packed nibbles)
        self.scale = scale  # f32 [..., out]
        self.in_dim = in_dim

    def tree_flatten(self):
        return (self.q4, self.scale), self.in_dim

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)


Weight = Union[jax.Array, QuantizedLinear, "QuantizedLinear4"]


def quantize_linear(w: jax.Array) -> QuantizedLinear:
    """Symmetric per-output-channel INT8 (amax over the input axis, -2)."""
    from ..ops.quant import quantize_int8

    q, s = quantize_int8(w, axis=-2)
    return QuantizedLinear(q, s)


def quantize_linear4(w: jax.Array) -> QuantizedLinear4:
    """Symmetric per-output-channel INT4 (range [-7, 7]), packed pairs."""
    from ..ops.quant import _EPS

    *lead, d_in, d_out = w.shape
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2), _EPS) / 7.0
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -7, 7).astype(jnp.int8)
    if d_in % 2:
        q = jnp.concatenate(
            [q, jnp.zeros((*lead, 1, d_out), jnp.int8)], axis=-2)
    u = (q + 8).astype(jnp.uint8)                 # offset-8 nibbles
    lo, hi = u[..., 0::2, :], u[..., 1::2, :]
    packed = (lo | (hi << 4)).astype(jnp.int8)
    return QuantizedLinear4(packed, scale, d_in)


def _unpack4(w: QuantizedLinear4) -> jax.Array:
    """Packed nibbles -> int8 values [-7, 7], original input length."""
    u = w.q4.astype(jnp.uint8)
    lo = (u & 0xF).astype(jnp.int8) - 8
    hi = ((u >> 4) & 0xF).astype(jnp.int8) - 8
    full = jnp.stack([lo, hi], axis=-2)           # [..., pairs, 2, out]
    full = full.reshape(*w.q4.shape[:-2], -1, w.q4.shape[-1])
    return full[..., : w.in_dim, :]


def dequantize_linear(w: Weight, dtype=jnp.bfloat16) -> jax.Array:
    if isinstance(w, QuantizedLinear):
        return (w.q.astype(jnp.float32) * w.scale[..., None, :]).astype(dtype)
    if isinstance(w, QuantizedLinear4):
        return (_unpack4(w).astype(jnp.float32) * w.scale[..., None, :]).astype(dtype)
    return w


def mm(x: jax.Array, w: Weight) -> jax.Array:
    """x @ w for float or weight-only-INT8 weights.

    INT8 path: the matmul runs on the int8 operand (MXU handles the int8->
    bf16 convert in-flight) and the per-channel scale multiplies the f32
    accumulator — the dequant never materializes in HBM."""
    if isinstance(w, QuantizedLinear):
        acc = jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.q.astype(jnp.bfloat16),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (acc * w.scale).astype(x.dtype)
    if isinstance(w, QuantizedLinear4):
        acc = jax.lax.dot_general(
            x.astype(jnp.bfloat16), _unpack4(w).astype(jnp.bfloat16),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (acc * w.scale).astype(x.dtype)
    return x @ w


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """x * rsqrt(mean(x^2) + eps) * weight, computed in fp32."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def swiglu(x: jax.Array, w_gate: Weight, w_up: Weight, w_down: Weight) -> jax.Array:
    """down(silu(x @ gate) * (x @ up)) — bias-free, LLaMA/DeepSeek style."""
    g = jax.nn.silu(mm(x, w_gate))
    return mm(g * mm(x, w_up), w_down)


def init_linear(key, d_in: int, d_out: int, dtype=jnp.float32, scale: float = 0.02):
    return (scale * jax.random.normal(key, (d_in, d_out))).astype(dtype)
