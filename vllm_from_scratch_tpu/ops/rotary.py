"""Rotary position embeddings (functional, table-driven).

Same math as the reference's RotaryEmbedding / rotate_half
(ref: 04_mla/mini_mla.py:25-72; duplicate at 05_mini_vllm/mini_vllm.py:355-374)
— ``rotate_half(x) = concat(-x2, x1)`` convention — but as pure functions over
a precomputed cos/sin table so the whole thing lives inside jit with static
shapes (no rebuild-on-overflow branch; the table is sized to max_position up
front).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_rope_table(max_position: int, dim: int, theta: float = 10000.0) -> jax.Array:
    """[max_position, dim] cos||sin table (dim must be even)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(max_position, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                      # [P, dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)      # [P, dim]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)  # [P, 2*dim]


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, positions: jax.Array, table: jax.Array) -> jax.Array:
    """Apply RoPE.

    x:         [..., T, H, D]  (rotated over D)
    positions: [..., T] int32
    table:     [max_position, 2*D] from make_rope_table
    """
    d = x.shape[-1]
    cs = table[positions]                               # [..., T, 2D]
    cos, sin = cs[..., :d], cs[..., d:]
    cos = jnp.expand_dims(cos, -2)                      # broadcast over heads
    sin = jnp.expand_dims(sin, -2)
    return (x * cos + rotate_half(x) * sin).astype(x.dtype)
