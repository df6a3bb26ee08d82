"""MLA paged attention in latent space with an INT8 latent KV cache.

Equivalent of the reference's MultiHeadLatentAttention + MLAKVCache
(ref: 04_mla/mini_mla.py:79-306) with the production decode optimization the
reference only documents (BLOG_PART3_V2.md:576-707):

- The cache stores only the compressed latent per token: ``c_kv`` (rank r)
  and the shared-head ``k_rope`` (rope_dim), paged in the same flat-slot
  layout as the MHA cache — 2*(r+dr) -> (r+dr) elements/token/layer vs
  2*Hkv*D for MHA (the 7-57x saving, mini_mla.py:313-362), quantized INT8
  with per-slot scales on top.
- Attention runs **in latent space** (the W_UK_T absorption trick,
  BLOG_PART3_V2.md:663-671): q_nope is pre-multiplied by W_UK so scores are
  taken directly against c_kv, and the value product stays in rank-r space
  until a final per-head W_UV expansion.  The reference instead re-expands
  kv_b_proj over the whole sequence every step (mini_mla.py:245-248 — its
  documented compute-for-memory trade); absorption reads the INT8 latent
  exactly once and is mathematically identical (linear maps commute through
  the attention-weighted sum).
- Decode (Tq=1) and history-aware chunked prefill (diagonal = S-T+1 mask,
  mini_mla.py:290-295) share one static-shape kernel, like ops.attention.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .quant import INT8_MAX, _EPS


class MLACache(NamedTuple):
    """Paged latent cache (flat-slot layout, optional leading layer axis)."""

    c: jax.Array         # [num_slots, r]   compressed KV latent (int8 or float)
    kr: jax.Array        # [num_slots, dr]  shared-head rotary key
    c_scale: jax.Array   # [num_slots] f32
    kr_scale: jax.Array  # [num_slots] f32

    @property
    def quantized(self) -> bool:
        return self.c.dtype == jnp.int8


def init_mla_cache(
    num_blocks: int,
    block_size: int,
    kv_lora_rank: int,
    rope_dim: int,
    kv_quant: str = "int8",
    dtype=jnp.float32,
) -> MLACache:
    num_slots = num_blocks * block_size
    cdt = jnp.int8 if kv_quant == "int8" else dtype
    return MLACache(
        c=jnp.zeros((num_slots, kv_lora_rank), cdt),
        kr=jnp.zeros((num_slots, rope_dim), cdt),
        c_scale=jnp.ones((num_slots,), jnp.float32),
        kr_scale=jnp.ones((num_slots,), jnp.float32),
    )


def _quant_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), _EPS) / INT8_MAX
    q = jnp.clip(jnp.round(xf / s[:, None]), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, s


def write_mla_cache(
    cache: MLACache,
    c_new: jax.Array,   # [T, r]  (already RMSNorm'd latent)
    kr_new: jax.Array,  # [T, dr] (already RoPE'd)
    slots: jax.Array,   # [T] int32
) -> MLACache:
    if cache.quantized:
        cq, cs = _quant_rows(c_new)
        kq, ks = _quant_rows(kr_new)
        return MLACache(
            c=cache.c.at[slots].set(cq),
            kr=cache.kr.at[slots].set(kq),
            c_scale=cache.c_scale.at[slots].set(cs),
            kr_scale=cache.kr_scale.at[slots].set(ks),
        )
    return MLACache(
        c=cache.c.at[slots].set(c_new.astype(cache.c.dtype)),
        kr=cache.kr.at[slots].set(kr_new.astype(cache.kr.dtype)),
        c_scale=cache.c_scale,
        kr_scale=cache.kr_scale,
    )


#: Prefill chunks at or above this many query tokens take the EXPANDED
#: (MHA-mode) path instead of absorption.  Absorption reads the latent once
#: — optimal for bandwidth-bound decode — but inflates compute-bound prefill:
#: scores/PV cost O(S*(2r+dr)) per query vs O(S*(dn+dr+dv)) expanded, a ~4x
#: FLOP inflation at DeepSeek-like shapes (r=256, dn=dv=64).  Expansion adds
#: a one-off O(S*r*(dn+dv)) up-projection, which amortizes once
#: Tq > r*(dn+dv)/(2r+dr) ~ 60.  Production MLA serving does exactly this
#: split (the reference documents the trade at BLOG_PART3_V2.md:563-578).
PREFILL_EXPAND_MIN_TQ = 64


def mla_prefill_expanded(
    q_nope: jax.Array,        # [B, Tq, H, dn]
    q_rope: jax.Array,        # [B, Tq, H, dr] (already RoPE'd)
    cache: MLACache,
    block_tables: jax.Array,  # [B, N]
    ctx_lens: jax.Array,      # [B]
    q_lens: jax.Array,        # [B]
    w_uk: jax.Array,          # [H, dn, r]
    w_uv: jax.Array,          # [H, r, dv]
    *,
    block_size: int,
    sm_scale: float,
) -> jax.Array:
    """MHA-mode prefill: re-expand K/V from the cached latents and run
    standard attention in the model dtype (bf16 matmuls on the MXU, f32
    softmax).  Mathematically identical to absorption — ``k_nope = c @
    W_UK^T`` and ``v = c @ W_UV`` are linear, so scores and the weighted sum
    commute — but the per-query score/PV work drops from (2r+dr) to
    (dn+dr+dv) contraction elements.  Returns [B, Tq, H, dv] float32."""
    B, Tq, H, dn = q_nope.shape
    dt = q_nope.dtype
    N = block_tables.shape[1]
    S = N * block_size
    offs = jnp.arange(block_size, dtype=block_tables.dtype)
    slot_idx = (block_tables[:, :, None] * block_size + offs).reshape(B, S)

    c = jnp.take(cache.c, slot_idx, axis=0, mode="clip").astype(jnp.float32)
    kr = jnp.take(cache.kr, slot_idx, axis=0, mode="clip").astype(jnp.float32)
    if cache.quantized:
        c = c * jnp.take(cache.c_scale, slot_idx, axis=0, mode="clip")[..., None]
        kr = kr * jnp.take(cache.kr_scale, slot_idx, axis=0, mode="clip")[..., None]
    c = c.astype(dt)
    kr = kr.astype(dt)

    # Up-project once per context token (the reference's own prefill form,
    # mini_mla.py:245-248) — O(S) instead of absorption's O(Tq*S) extra.
    k_nope = jnp.einsum("bsr,hnr->bshn", c, w_uk.astype(dt))    # [B,S,H,dn]
    v = jnp.einsum("bsr,hrv->bshv", c, w_uv.astype(dt))         # [B,S,H,dv]

    scores = (
        jnp.einsum("bthn,bshn->bhts", q_nope, k_nope,
                   preferred_element_type=jnp.float32)
        + jnp.einsum("bthd,bsd->bhts", q_rope, kr,
                     preferred_element_type=jnp.float32)
    ) * sm_scale

    kv_pos = jnp.arange(S, dtype=jnp.int32)[None, None, :]
    q_pos = (ctx_lens - q_lens)[:, None, None] + jnp.arange(Tq, dtype=jnp.int32)[None, :, None]
    mask = (kv_pos <= q_pos) & (kv_pos < ctx_lens[:, None, None])
    mask_b = mask[:, None, :, :]                                # [B,1,Tq,S]

    scores = jnp.where(mask_b, scores, -jnp.inf)
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), -1e30)
    e = jnp.exp(scores - m) * mask_b
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), _EPS)
    return jnp.einsum("bhts,bshv->bthv", p.astype(dt), v,
                      preferred_element_type=jnp.float32)


def mla_paged_attention(
    q_nope: jax.Array,        # [B, Tq, H, dn]
    q_rope: jax.Array,        # [B, Tq, H, dr] (already RoPE'd)
    cache: MLACache,
    block_tables: jax.Array,  # [B, N]
    ctx_lens: jax.Array,      # [B]
    q_lens: Optional[jax.Array],
    w_uk: jax.Array,          # [H, dn, r]  (from kv_b_proj)
    w_uv: jax.Array,          # [H, r, dv]
    *,
    block_size: int,
    sm_scale: float,
    allow_pallas: bool = True,
) -> jax.Array:
    """Latent-space paged attention.  Returns [B, Tq, H, dv] float32.

    Large prefill chunks (Tq >= PREFILL_EXPAND_MIN_TQ) take the expanded
    MHA-mode path; decode and short chunks stay absorbed (latent read once).
    ``allow_pallas=False`` forces the XLA einsum path — required for
    TPLA-sharded latents (GSPMD inserts the over-r psums automatically;
    the Pallas kernel only runs unsharded/replicated)."""
    import os

    B, Tq, H, dn = q_nope.shape
    if q_lens is None:
        q_lens = jnp.full((B,), Tq, dtype=jnp.int32)

    min_tq = int(os.environ.get("VFS_MLA_EXPAND_MIN_TQ",
                                str(PREFILL_EXPAND_MIN_TQ)))
    if allow_pallas and Tq >= min_tq:
        # allow_pallas=False doubles as "keep one GSPMD-shardable einsum
        # form" (TPLA); the expanded path is single-device like the kernel.
        return mla_prefill_expanded(
            q_nope, q_rope, cache, block_tables, ctx_lens, q_lens, w_uk, w_uv,
            block_size=block_size, sm_scale=sm_scale,
        )

    from . import pallas as _pk

    # Long contexts take the kernel (query-row tiling bounds prefill VMEM);
    # short contexts stay on the XLA gather path (measured crossover).
    if allow_pallas and _pk.use_pallas(padded_ctx=block_tables.shape[1] * block_size):
        q_l = jnp.einsum(
            "bthd,hdr->bthr", q_nope.astype(jnp.float32), w_uk.astype(jnp.float32)
        )
        latent = _pk.mla_paged_attention_pallas(
            q_l, q_rope, cache.c, cache.kr, cache.c_scale, cache.kr_scale,
            block_tables, ctx_lens, q_lens,
            block_size=block_size, sm_scale=sm_scale,
        )
        return jnp.einsum("bthr,hrv->bthv", latent, w_uv.astype(jnp.float32))

    N = block_tables.shape[1]
    S = N * block_size
    offs = jnp.arange(block_size, dtype=block_tables.dtype)
    slot_idx = (block_tables[:, :, None] * block_size + offs).reshape(B, S)

    c = jnp.take(cache.c, slot_idx, axis=0, mode="clip").astype(jnp.float32)    # [B, S, r]
    kr = jnp.take(cache.kr, slot_idx, axis=0, mode="clip").astype(jnp.float32)  # [B, S, dr]

    # Absorb W_UK into the query: scores live in rank-r space.
    q_l = jnp.einsum("bthd,hdr->bthr", q_nope.astype(jnp.float32), w_uk.astype(jnp.float32))
    scores_c = jnp.einsum("bthr,bsr->bhts", q_l, c)
    scores_r = jnp.einsum("bthd,bsd->bhts", q_rope.astype(jnp.float32), kr)
    if cache.quantized:
        cs = jnp.take(cache.c_scale, slot_idx, axis=0, mode="clip")   # [B, S]
        ks = jnp.take(cache.kr_scale, slot_idx, axis=0, mode="clip")
        scores_c = scores_c * cs[:, None, None, :]
        scores_r = scores_r * ks[:, None, None, :]
    scores = (scores_c + scores_r) * sm_scale

    kv_pos = jnp.arange(S, dtype=jnp.int32)[None, None, :]
    q_pos = (ctx_lens - q_lens)[:, None, None] + jnp.arange(Tq, dtype=jnp.int32)[None, :, None]
    mask = (kv_pos <= q_pos) & (kv_pos < ctx_lens[:, None, None])
    mask_b = mask[:, None, :, :]                                   # [B,1,Tq,S]

    scores = jnp.where(mask_b, scores, -jnp.inf)
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), -1e30)
    e = jnp.exp(scores - m) * mask_b
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), _EPS)  # [B,H,Tq,S]

    if cache.quantized:
        p = p * cs[:, None, None, :]
    latent = jnp.einsum("bhts,bsr->bthr", p, c)                    # [B,Tq,H,r]
    return jnp.einsum("bthr,hrv->bthv", latent, w_uv.astype(jnp.float32))
