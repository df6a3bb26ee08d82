"""MLA (Multi-head Latent Attention) model block.

Equivalent of the reference MultiHeadLatentAttention (ref: 04_mla/
mini_mla.py:139-306) as a functional layer over the paged INT8 latent cache:

- Two-stage low-rank Q: q_a_proj -> RMSNorm -> q_b_proj, with
  q_lora_rank defaulting to num_heads * qk_head_dim // 4 (mini_mla.py:174-177).
- KV compression: kv_a_proj_with_mqa -> (c_kv | k_rope); RMSNorm on c_kv
  before it is cached (mini_mla.py:181-186, 227-232).
- Decoupled RoPE: per-head q_rope, single shared-head k_rope
  (mini_mla.py:264-274); k_rope is rotated once at write time.
- kv_b_proj is *not* re-expanded over the sequence each step (the
  reference's compute trade, mini_mla.py:245-248): its two halves are
  reshaped into W_UK [H, dn, r] / W_UV [H, r, dv] and absorbed into the
  attention (ops.mla_attention), so decode reads the latent cache once.

``compare_kv_cache_size`` ports the KV-size comparator (mini_mla.py:313-362).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..ops.mla_attention import MLACache, mla_paged_attention, write_mla_cache
from ..ops.rotary import apply_rope
from .layers import mm, rms_norm


def mla_dims(cfg: ModelConfig) -> Tuple[int, int, int, int, int]:
    """(dn, dr, dv, r, qr) with the reference's defaults filled in."""
    dn = cfg.qk_nope_head_dim or cfg.head_dim
    dr = cfg.qk_rope_head_dim
    dv = cfg.v_head_dim or cfg.head_dim
    r = cfg.kv_lora_rank
    qr = cfg.q_lora_rank or max(cfg.num_heads * (dn + dr) // 4, 8)
    return dn, dr, dv, r, qr


def init_mla_layer_params(key, cfg: ModelConfig, num_layers: int, dtype) -> dict:
    """Layer-stacked MLA projection weights [L, ...]."""
    dn, dr, dv, r, qr = mla_dims(cfg)
    H, nh, L = cfg.hidden_size, cfg.num_heads, num_layers
    ks = jax.random.split(key, 6)

    def stack(k, shape):
        return (0.02 * jax.random.normal(k, (L, *shape))).astype(dtype)

    return {
        "q_a": stack(ks[0], (H, qr)),
        "q_a_norm": jnp.ones((L, qr), dtype),
        "q_b": stack(ks[1], (qr, nh * (dn + dr))),
        "kv_a": stack(ks[2], (H, r + dr)),
        "kv_norm": jnp.ones((L, r), dtype),
        "kv_b": stack(ks[3], (r, nh * (dn + dv))),
        "wo": stack(ks[4], (nh * dv, H)),
    }


def split_kv_b(kv_b: jax.Array, num_heads: int, dn: int, dv: int):
    """kv_b [r, H*(dn+dv)] -> (W_UK [H, dn, r], W_UV [H, r, dv])."""
    r = kv_b.shape[0]
    m = kv_b.reshape(r, num_heads, dn + dv)
    w_uk = m[:, :, :dn].transpose(1, 2, 0)   # [H, dn, r]
    w_uv = m[:, :, dn:].transpose(1, 0, 2)   # [H, r, dv]
    return w_uk, w_uv


def mla_attention_block(
    layer: dict,
    cache_l: MLACache,
    h: jax.Array,            # [B, T, H]
    batch,                   # ModelBatch
    cfg: ModelConfig,
    rope_table: jax.Array,
    *,
    block_size: int,
    allow_pallas: bool = True,
    mesh=None,
    cp_manual: int = 0,
    cp_attn: str = "merge",
) -> Tuple[jax.Array, MLACache]:
    """Pre-norm MLA attention with paged latent KV read/write.

    When ``mesh`` carries a "cp" axis the write+attend runs context-parallel
    over the cp-sharded cache (parallel/cp_serving.py — PCP/DCP).
    ``cp_manual=n``: the caller is ALREADY inside a manual region over "cp"
    of size n (the pipeline runner, pp x cp) — run the cp body directly."""
    B, T, _ = h.shape
    nh = cfg.num_heads
    dn, dr, dv, r, _ = mla_dims(cfg)

    x = rms_norm(h, layer["attn_norm"], cfg.rms_norm_eps)

    if "qkv_a" in layer:
        # transformer.fuse_projections: q_a|kv_a in ONE matmul (same input
        # x; per-out-channel scales make the fusion bit-exact).
        qa_ckr = mm(x, layer["qkv_a"])                        # [B,T,qr+r+dr]
        qr_rank = qa_ckr.shape[-1] - (r + dr)
        qa_out, ckr = qa_ckr[..., :qr_rank], qa_ckr[..., qr_rank:]
    else:
        qa_out = mm(x, layer["q_a"])
        ckr = mm(x, layer["kv_a"])                            # [B, T, r+dr]

    # Q: low-rank two-stage projection, split nope | rope.
    q = mm(rms_norm(qa_out, layer["q_a_norm"], cfg.rms_norm_eps), layer["q_b"])
    q = q.reshape(B, T, nh, dn + dr)
    q_nope, q_rope = q[..., :dn], q[..., dn:]
    q_rope = apply_rope(q_rope, batch.positions, rope_table)

    # KV: latent + shared rotary key; normalize latent, rotate key.
    c_kv = rms_norm(ckr[..., :r], layer["kv_norm"], cfg.rms_norm_eps)
    k_rope = ckr[..., r:][:, :, None, :]                      # [B, T, 1, dr]
    k_rope = apply_rope(k_rope, batch.positions, rope_table)[:, :, 0]

    w_uk, w_uv = split_kv_b(layer["kv_b"], nh, dn, dv)
    if cp_manual > 1:
        from ..parallel.cp_serving import cp_mla_attention_manual

        out, cache_l = cp_mla_attention_manual(
            q_nope, q_rope,
            c_kv.reshape(B * T, r), k_rope.reshape(B * T, dr),
            cache_l, batch.slots.reshape(B * T),
            batch.block_tables, batch.ctx_lens, batch.q_lens,
            w_uk, w_uv, cp_size=cp_manual,
            block_size=block_size, sm_scale=(dn + dr) ** -0.5,
            variant=cp_attn,
        )
        return (mm(out.astype(h.dtype).reshape(B, T, nh * dv), layer["wo"]),
                cache_l)
    if mesh is not None and mesh.shape.get("cp", 1) > 1:
        from ..parallel.cp_serving import cp_mla_attention

        out, cache_l = cp_mla_attention(
            q_nope, q_rope,
            c_kv.reshape(B * T, r), k_rope.reshape(B * T, dr),
            cache_l, batch.slots.reshape(B * T),
            batch.block_tables, batch.ctx_lens, batch.q_lens,
            w_uk, w_uv, mesh,
            block_size=block_size, sm_scale=(dn + dr) ** -0.5,
            variant=cp_attn,
        )
        return mm(out.astype(h.dtype).reshape(B, T, nh * dv), layer["wo"]), cache_l

    cache_l = write_mla_cache(
        cache_l,
        c_kv.reshape(B * T, r),
        k_rope.reshape(B * T, dr),
        batch.slots.reshape(B * T),
    )

    out = mla_paged_attention(
        q_nope, q_rope, cache_l, batch.block_tables, batch.ctx_lens, batch.q_lens,
        w_uk, w_uv, block_size=block_size, sm_scale=(dn + dr) ** -0.5,
        allow_pallas=allow_pallas,
    )
    return mm(out.astype(h.dtype).reshape(B, T, nh * dv), layer["wo"]), cache_l


def compare_kv_cache_size(
    num_heads: int,
    head_dim: int,
    kv_lora_rank: int,
    rope_dim: int,
    elem_bytes: float = 2.0,
    latent_elem_bytes: float | None = None,
) -> dict:
    """Bytes/token/layer: MHA (K+V all heads) vs MLA latent (c_kv + k_rope).

    Port of mini_mla.py:313-362; DeepSeek-V2 spec (128 heads x 128 dim,
    r=512, dr=64) gives 32768 vs 576 elements = 56.9x.  With our INT8 latent
    cache (latent_elem_bytes=1 plus 8 scale bytes/token) the byte saving
    roughly doubles again.
    """
    mha_elems = 2 * num_heads * head_dim
    mla_elems = kv_lora_rank + rope_dim
    mha_bytes = mha_elems * elem_bytes
    lat_bytes = latent_elem_bytes if latent_elem_bytes is not None else elem_bytes
    mla_bytes = mla_elems * lat_bytes + (8.0 if lat_bytes == 1 else 0.0)
    return {
        "mha_elems_per_token_layer": mha_elems,
        "mla_elems_per_token_layer": mla_elems,
        "mha_bytes": mha_bytes,
        "mla_bytes": mla_bytes,
        "ratio": mha_bytes / mla_bytes,
    }
