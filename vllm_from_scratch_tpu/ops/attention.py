"""Paged attention ops — pure-JAX/XLA reference path.

This module is the XLA-compiled implementation of the three kernel-critical
ops the reference simulates in Python loops:

- ``write_kv_cache``   — scatter new K/V into flat cache slots, quantizing to
  INT8 with per-slot scales on the way in (replaces the scatter at
  05_mini_vllm/mini_vllm.py:422-427 and KVCachePool.write_kv at
  01_paged_attention/paged_attention.py:44-51).
- ``paged_attention``  — batched attention over non-contiguous KV pages via
  block tables, one unified kernel for decode (Tq=1) and chunked prefill
  (Tq=chunk) using the history-aware causal mask (the ``diagonal = S-T+1``
  trick, ref: 04_mla/mini_mla.py:290-295).  Replaces paged_attention_decode /
  paged_attention_prefill (paged_attention.py:67-136) and fixes the
  reference's known decode bug (mini_vllm.py:468-473 reads the first N slots
  of the cache instead of gathering through the request's block table — here
  every read goes through the table).
- ``dense_attention``  — the naive oracle the tests compare against
  (test_paged_attention.py:67-100 equivalence idiom).

Everything is static-shape and jit-friendly: ragged batches are expressed as
(q_lens, ctx_lens) int32 vectors + padding, never Python loops.  A Pallas
flash-decoding kernel (ops/pallas/) overrides this path on TPU; this module
is the semantics contract and the CPU-test implementation.

Cache layout: flat slots.  ``k_cache[num_slots, Hkv, D]`` with
``num_slots = num_blocks * block_size`` so ``slot = block_id*block_size + off``
indexes rows directly; per-slot-per-head scales ``k_scale[num_slots, Hkv]``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .quant import INT8_MAX, _EPS


class KVCache(NamedTuple):
    """One layer's paged KV cache (flat-slot layout)."""

    k: jax.Array        # [num_slots, Hkv, D] int8 (quantized) or float
    v: jax.Array        # [num_slots, Hkv, D]
    k_scale: jax.Array  # [num_slots, Hkv] f32 (ones when unquantized)
    v_scale: jax.Array  # [num_slots, Hkv] f32

    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8


def init_kv_cache(
    num_blocks: int,
    block_size: int,
    num_kv_heads: int,
    head_dim: int,
    kv_quant: str = "int8",
    dtype=jnp.float32,
) -> KVCache:
    num_slots = num_blocks * block_size
    kv_dtype = jnp.int8 if kv_quant == "int8" else dtype
    z = jnp.zeros((num_slots, num_kv_heads, head_dim), dtype=kv_dtype)
    s = jnp.ones((num_slots, num_kv_heads), dtype=jnp.float32)
    return KVCache(k=z, v=z, k_scale=s, v_scale=s)


def write_kv_cache(
    cache: KVCache,
    k_new: jax.Array,   # [T, Hkv, D] float
    v_new: jax.Array,   # [T, Hkv, D]
    slots: jax.Array,   # [T] int32 flat slot ids (pad tokens -> null-block slots)
) -> KVCache:
    """Scatter-write new tokens into their physical slots.

    Pad tokens must carry slots inside the pinned null block (block 0) — they
    get overwritten harmlessly and are never attended (masked by ctx_lens).
    """
    if cache.quantized:
        kf = k_new.astype(jnp.float32)
        vf = v_new.astype(jnp.float32)
        k_amax = jnp.max(jnp.abs(kf), axis=-1)              # [T, Hkv]
        v_amax = jnp.max(jnp.abs(vf), axis=-1)
        k_s = jnp.maximum(k_amax, _EPS) / INT8_MAX
        v_s = jnp.maximum(v_amax, _EPS) / INT8_MAX
        k_q = jnp.clip(jnp.round(kf / k_s[..., None]), -INT8_MAX, INT8_MAX).astype(jnp.int8)
        v_q = jnp.clip(jnp.round(vf / v_s[..., None]), -INT8_MAX, INT8_MAX).astype(jnp.int8)
        return KVCache(
            k=cache.k.at[slots].set(k_q),
            v=cache.v.at[slots].set(v_q),
            k_scale=cache.k_scale.at[slots].set(k_s),
            v_scale=cache.v_scale.at[slots].set(v_s),
        )
    return KVCache(
        k=cache.k.at[slots].set(k_new.astype(cache.k.dtype)),
        v=cache.v.at[slots].set(v_new.astype(cache.v.dtype)),
        k_scale=cache.k_scale,
        v_scale=cache.v_scale,
    )


def paged_attention(
    q: jax.Array,             # [B, Tq, Hq, D]
    cache: KVCache,
    block_tables: jax.Array,  # [B, N] int32 (pad entries -> 0, the null block)
    ctx_lens: jax.Array,      # [B] int32: total tokens incl. this chunk
    q_lens: Optional[jax.Array] = None,  # [B] int32 actual new tokens (<= Tq); None => Tq
    *,
    block_size: int,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Batched GQA attention over paged KV with fused INT8 dequant.

    Query i of request b sits at global position ``ctx_lens[b] - q_lens[b] + i``
    and attends to all kv positions <= its own — decode and history-aware
    chunked prefill fall out of the same mask.  Returns [B, Tq, Hq, D] float32.
    """
    B, Tq, Hq, D = q.shape
    Hkv = cache.k.shape[1]
    G = Hq // Hkv
    sm_scale = sm_scale if sm_scale is not None else D ** -0.5
    if q_lens is None:
        q_lens = jnp.full((B,), Tq, dtype=jnp.int32)

    from . import pallas as _pk

    # Pallas wins on long contexts (decode: flash page streaming; prefill:
    # query-row tiling bounds VMEM and skips causally-dead chunks).  Short
    # contexts stay on the XLA gather path (measured crossover).
    if _pk.use_pallas(padded_ctx=block_tables.shape[1] * block_size):
        return _pk.paged_attention_pallas(
            q, cache.k, cache.v, cache.k_scale, cache.v_scale,
            block_tables, ctx_lens, q_lens,
            block_size=block_size, sm_scale=sm_scale,
        )

    N = block_tables.shape[1]
    S = N * block_size
    # Expand block tables to flat slot indices: [B, S]
    offs = jnp.arange(block_size, dtype=block_tables.dtype)
    slot_idx = (block_tables[:, :, None] * block_size + offs).reshape(B, S)

    k = jnp.take(cache.k, slot_idx, axis=0, mode="clip")          # [B, S, Hkv, D]
    v = jnp.take(cache.v, slot_idx, axis=0, mode="clip")
    qf = q.astype(jnp.float32).reshape(B, Tq, Hkv, G, D)

    # scores: [B, Hkv, G, Tq, S]; K dequant folded in after the matmul.
    scores = jnp.einsum("btkgd,bskd->bkgts", qf, k.astype(jnp.float32))
    if cache.quantized:
        ks = jnp.take(cache.k_scale, slot_idx, axis=0, mode="clip")    # [B, S, Hkv]
        scores = scores * ks.transpose(0, 2, 1)[:, :, None, None, :]
    scores = scores * sm_scale

    # History-aware causal mask (diagonal = ctx - q_len + 1).
    kv_pos = jnp.arange(S, dtype=jnp.int32)[None, None, :]            # [1,1,S]
    q_pos = (ctx_lens - q_lens)[:, None, None] + jnp.arange(Tq, dtype=jnp.int32)[None, :, None]
    mask = (kv_pos <= q_pos) & (kv_pos < ctx_lens[:, None, None])     # [B,Tq,S]
    mask_b = mask[:, None, None, :, :]                                # [B,1,1,Tq,S]

    scores = jnp.where(mask_b, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.maximum(m, -1e30)  # fully-masked pad rows stay finite
    e = jnp.exp(scores - m) * mask_b
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), _EPS)

    # V dequant folded into the probabilities.
    if cache.quantized:
        vs = jnp.take(cache.v_scale, slot_idx, axis=0, mode="clip")    # [B, S, Hkv]
        p = p * vs.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum("bkgts,bskd->btkgd", p, v.astype(jnp.float32))
    return out.reshape(B, Tq, Hq, D)


def dense_attention(
    q: jax.Array,  # [B, T, Hq, D]
    k: jax.Array,  # [B, S, Hkv, D]
    v: jax.Array,  # [B, S, Hkv, D]
    *,
    causal: bool = True,
    history_len: int | jax.Array = 0,  # queries start at this global position
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Naive dense GQA attention — the oracle for equivalence tests."""
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    sm_scale = sm_scale if sm_scale is not None else D ** -0.5
    qf = q.astype(jnp.float32).reshape(B, T, Hkv, G, D)
    scores = jnp.einsum("btkgd,bskd->bkgts", qf, k.astype(jnp.float32)) * sm_scale
    if causal:
        S = k.shape[1]
        kv_pos = jnp.arange(S)[None, :]
        q_pos = jnp.arange(T)[:, None] + history_len
        scores = jnp.where(kv_pos <= q_pos, scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bskd->btkgd", p, v.astype(jnp.float32))
    return out.reshape(B, T, Hq, D)
