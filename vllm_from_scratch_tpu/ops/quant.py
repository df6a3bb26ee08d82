"""Quantization primitives for the INT8 KV cache.

(Weight-only INT8/INT4 lives in models/layers.py: QuantizedLinear[4] + mm.)

The reference keeps everything fp32 (no quantization anywhere in-repo); the
TPU build's north star (BASELINE.json) is INT8 KV pages with scales riding
alongside, dequant fused into the attention matmuls, and weight-only INT8
for MoE experts / MLA projections.

Scale granularity: the KV cache uses **per-slot, per-kv-head** scales.
SURVEY.md §7 suggests per-block scales, but paged writes are incremental
(chunked prefill fills a block across steps; decode appends one slot at a
time), and a block-level dynamic scale would require requantizing old slots
on every append.  A per-slot scale is write-once, strictly finer-grained, and
costs 4 bytes per slot per kv-head — noise next to the int8 payload.

Dequant is folded into attention rather than materializing fp copies:
  scores[t] = (q . k_int8[t]) * k_scale[t]        (fold into scores)
  out       = sum_t (p[t] * v_scale[t]) * v_int8[t] (fold into probs)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT8_MAX = 127.0
_EPS = 1e-8


def quantize_int8(x: jax.Array, axis) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization; amax over ``axis`` (kept in the scale).

    Returns (q: int8 same shape as x, scale: f32 with ``axis`` reduced).
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis)
    scale = jnp.maximum(amax, _EPS) / INT8_MAX
    q = jnp.round(x.astype(jnp.float32) / jnp.expand_dims(scale, axis))
    q = jnp.clip(q, -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


def dequantize_int8(q: jax.Array, scale: jax.Array, axis) -> jax.Array:
    return q.astype(jnp.float32) * jnp.expand_dims(scale, axis)

