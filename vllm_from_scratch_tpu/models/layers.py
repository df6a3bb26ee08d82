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
    """Weight-only INT4: two offset-8 nibbles packed per int8.

    Packing ``layout``s (aux data together with ``in_dim``, so lax.scan /
    device_put only see the two arrays):

    - ``"pair"``   — q4[..., i, o] holds input rows 2i (low) and 2i+1
      (high): the generic layout.
    - ``"half_in"``  — low nibble holds input row i, high holds row
      i + in/2: unpack is a contiguous concat (no interleave), which is
      what the fused MoE kernel needs to unpack in-register on the MXU
      path (ops/pallas/moe_gemm.py).
    - ``"half_out"`` — packed along the OUTPUT axis: q4[..., i, o] holds
      output cols o (low) and o + out/2 (high); for the down projection,
      whose input axis is the kernel's blocked F axis.

    scale is per-output-channel like INT8 in every layout.
    """

    def __init__(self, q4: jax.Array, scale: jax.Array, in_dim: int,
                 layout: str = "pair"):
        self.q4 = q4       # int8, two packed nibbles (see layout)
        self.scale = scale  # f32 [..., out]
        self.in_dim = in_dim
        self.layout = layout

    def tree_flatten(self):
        return (self.q4, self.scale), (self.in_dim, self.layout)

    @classmethod
    def tree_unflatten(cls, aux, children):
        in_dim, layout = aux if isinstance(aux, tuple) else (aux, "pair")
        return cls(children[0], children[1], in_dim, layout)


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


def _quantize4_values(w: jax.Array):
    """(q int8 in [-7, 7], scale) — shared by the packing layouts."""
    from ..ops.quant import _EPS

    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2), _EPS) / 7.0
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -7, 7).astype(jnp.int8)
    return q, scale


def quantize_linear4_half_in(w: jax.Array) -> QuantizedLinear4:
    """INT4 packed (row i | row i + in/2) — the fused-kernel layout for
    weights whose input axis is hidden D (gate/up)."""
    d_in = w.shape[-2]
    assert d_in % 2 == 0, "half_in packing needs an even input dim"
    q, scale = _quantize4_values(w)
    u = (q + 8).astype(jnp.uint8)
    lo, hi = u[..., : d_in // 2, :], u[..., d_in // 2 :, :]
    packed = (lo | (hi << 4)).astype(jnp.int8)
    return QuantizedLinear4(packed, scale, d_in, layout="half_in")


def quantize_linear4_half_out(w: jax.Array) -> QuantizedLinear4:
    """INT4 packed along the OUTPUT axis (col o | col o + out/2) — the
    fused-kernel layout for the down projection (its input axis F is the
    kernel's blocked grid axis, so packing must not touch it)."""
    d_in, d_out = w.shape[-2], w.shape[-1]
    assert d_out % 2 == 0, "half_out packing needs an even output dim"
    q, scale = _quantize4_values(w)
    u = (q + 8).astype(jnp.uint8)
    lo, hi = u[..., :, : d_out // 2], u[..., :, d_out // 2 :]
    packed = (lo | (hi << 4)).astype(jnp.int8)
    return QuantizedLinear4(packed, scale, d_in, layout="half_out")


def _unpack4(w: QuantizedLinear4) -> jax.Array:
    """Packed nibbles -> int8 values [-7, 7], original [in, out] shape."""
    u = w.q4.astype(jnp.uint8)
    lo = (u & 0xF).astype(jnp.int8) - 8
    hi = ((u >> 4) & 0xF).astype(jnp.int8) - 8
    if w.layout == "half_in":
        return jnp.concatenate([lo, hi], axis=-2)[..., : w.in_dim, :]
    if w.layout == "half_out":
        return jnp.concatenate([lo, hi], axis=-1)
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


def concat_out(w1: Weight, w2: Weight):
    """Concatenate two weights along the OUTPUT axis, or None if layouts
    differ.  Per-output-channel scales concatenate exactly, so fusing two
    same-input matmuls into one (y = x @ [W1|W2]) is bit-identical for
    float and weight-only INT8/INT4 — the engine fuses q_a+kv_a and the
    shared expert's gate|up this way to halve small-matmul dispatches
    (each ~10-20 us of per-op latency on v5e at decode batch sizes)."""
    if isinstance(w1, QuantizedLinear) and isinstance(w2, QuantizedLinear):
        return QuantizedLinear(
            jnp.concatenate([w1.q, w2.q], axis=-1),
            jnp.concatenate([w1.scale, w2.scale], axis=-1))
    if isinstance(w1, QuantizedLinear4) and isinstance(w2, QuantizedLinear4):
        if w1.layout != w2.layout or w1.layout == "half_out":
            return None  # half_out interleaves the output axis
        if w1.in_dim != w2.in_dim:
            return None
        return QuantizedLinear4(
            jnp.concatenate([w1.q4, w2.q4], axis=-1),
            jnp.concatenate([w1.scale, w2.scale], axis=-1),
            w1.in_dim, w1.layout)
    if isinstance(w1, jax.Array) and isinstance(w2, jax.Array):
        return jnp.concatenate([w1, w2], axis=-1)
    return None  # mixed float/quantized


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
