"""Pallas MLA latent-space paged-attention kernel.

The real-kernel equivalent of the fused MLA decode attention the reference
only documents (Ascend npu_fused_infer_attention_score / W_UK_T absorption,
BLOG_PART3_V2.md:576-707); replaces the XLA gather path in
ops/mla_attention.py on TPU.

Everything happens in the compressed latent space (rank r + rope_dim per
token, the 7-57x KV saving of ref: 04_mla/mini_mla.py:313-362):

- Queries arrive pre-absorbed: ``q_l = q_nope @ W_UK`` [B, R, r] and the
  rotary part ``q_r`` [B, R, dr], R = Tq*H row-major by (token, head).
- Scores for a chunk are ONE rank-r matmul plus one rope_dim matmul against
  the int8 latents ``c`` / ``kr`` — no per-head loop, no K up-projection.
- The PV product stays in latent space: acc += (p * c_scale) @ c, so the
  kernel returns [B, R, r] latents; the per-head W_UV expansion is a dense
  einsum outside (XLA fuses it with o_proj).
- Same chunked flash pipeline as paged_attention.py: grid (B, num_chunks),
  each chunk = P scattered pages gathered by P BlockSpecs reading the
  scalar-prefetched block table (P pages per step amortizes pipeline/DMA
  overhead), INT8 scales fused into scores and probabilities, chunks past
  ctx_len skipped.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_CHUNK_TOKENS = 512


def _concat(parts):
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _kernel_body(H: int, block_size: int, P: int, sm_scale: float, quantized: bool):
    S_c = P * block_size

    def kern(tbl_ref, ctx_ref, qstart_ref, ql_ref, qr_ref, *refs):
        c_refs = refs[0:P]                  # each [1, bs, r]
        kr_refs = refs[P:2 * P]             # each [1, bs, dr]
        cs_refs = refs[2 * P:3 * P]         # each [1, bs, 1]
        krs_refs = refs[3 * P:4 * P]
        o_ref = refs[4 * P]                 # [1, TILE_R, r]
        acc_ref, m_ref, l_ref = refs[4 * P + 1:]
        b = pl.program_id(0)
        qt = pl.program_id(1)               # query-row tile
        ci = pl.program_id(2)
        R = ql_ref.shape[1]

        @pl.when(ci == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        ctx = ctx_ref[b]
        qs = qstart_ref[b]
        row0 = qt * R
        tile_last_pos = qs + (row0 + R - 1) // H

        @pl.when((ci * S_c < ctx) & (ci * S_c <= tile_last_pos))
        def _chunk():
            def dequant(ref, s_ref):
                # Row-fold the per-token scale into the float rows (both the
                # score and PV uses of ``c`` then come pre-dequantized).
                x = ref[0].astype(jnp.float32)   # [bs, width]
                if quantized:
                    x = x * s_ref[0]             # [bs, 1]
                return x

            c = _concat([dequant(c_refs[i], cs_refs[i]) for i in range(P)])
            kr = _concat([dequant(kr_refs[i], krs_refs[i]) for i in range(P)])
            s = jax.lax.dot_general(
                ql_ref[0], c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                    # [R, S_c]
            sr = jax.lax.dot_general(
                qr_ref[0], kr, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = (s + sr) * sm_scale

            row_pos = qs + (
                row0 + jax.lax.broadcasted_iota(jnp.int32, (R, S_c), 0)
            ) // H
            kv_pos = ci * S_c + jax.lax.broadcasted_iota(jnp.int32, (R, S_c), 1)
            mask = (kv_pos <= row_pos) & (kv_pos < ctx)
            s = jnp.where(mask, s, _NEG_INF)

            m_prev = m_ref[...]                  # [R, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)  # [R, S_c]
            m_ref[...] = m_new
            l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)

            pv = jax.lax.dot_general(
                p, c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                    # [R, r]
            acc_ref[...] = acc_ref[...] * alpha + pv

        @pl.when(ci == pl.num_programs(2) - 1)
        def _finish():
            o_ref[0] = acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)

    return kern


def mla_paged_attention_pallas(
    q_l: jax.Array,           # [B, Tq, H, r]  (q_nope pre-absorbed by W_UK)
    q_r: jax.Array,           # [B, Tq, H, dr] (already RoPE'd)
    c_cache: jax.Array,       # [num_slots, r] int8/float latents
    kr_cache: jax.Array,      # [num_slots, dr]
    c_scale: jax.Array,       # [num_slots] f32
    kr_scale: jax.Array,
    block_tables: jax.Array,  # [B, N]
    ctx_lens: jax.Array,      # [B]
    q_lens: Optional[jax.Array],
    *,
    block_size: int,
    sm_scale: float,
    pages_per_step: Optional[int] = None,
    tile_r: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Latent flash paged attention; returns latents [B, Tq, H, r] float32.

    Query rows beyond ``tile_r`` tile over a third grid dim with causal
    chunk skipping (bounded VMEM for big prefill chunks)."""
    from . import resolve_interpret

    B, Tq, H, r = q_l.shape
    dr = q_r.shape[-1]
    R = Tq * H
    N = block_tables.shape[1]
    bs = block_size
    nb = c_cache.shape[0] // bs
    quantized = c_cache.dtype == jnp.int8

    P = pages_per_step or max(1, min(N, -(-_CHUNK_TOKENS // bs)))
    if N % P:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, P - N % P)))
        N = block_tables.shape[1]
    C = N // P

    if q_lens is None:
        q_lens = jnp.full((B,), Tq, dtype=jnp.int32)
    q_start = (ctx_lens - q_lens).astype(jnp.int32)

    ql2 = q_l.astype(jnp.float32).reshape(B, R, r)
    qr2 = q_r.astype(jnp.float32).reshape(B, R, dr)
    TILE_R = min(R, tile_r)
    R_pad = -(-R // TILE_R) * TILE_R
    if R_pad != R:
        ql2 = jnp.pad(ql2, ((0, 0), (0, R_pad - R), (0, 0)))
        qr2 = jnp.pad(qr2, ((0, 0), (0, R_pad - R), (0, 0)))
    QT = R_pad // TILE_R
    c_pages = c_cache.reshape(nb, bs, r)
    kr_pages = kr_cache.reshape(nb, bs, dr)
    # [nb, bs, 1] column layout so scales row-fold into [bs, width] pages;
    # also satisfies Mosaic's block-dim rule ((1, bs) blocks of [nb, bs]
    # are neither (8,128)-aligned nor full-array).
    cs_pages = c_scale.reshape(nb, bs, 1)
    krs_pages = kr_scale.reshape(nb, bs, 1)

    def page_map(i):
        return lambda b, t, c, tbl, ctx, qs: (tbl[b, c * P + i], 0, 0)

    c_spec = lambda i: pl.BlockSpec((1, bs, r), page_map(i))
    kr_spec = lambda i: pl.BlockSpec((1, bs, dr), page_map(i))
    sc_spec = lambda i: pl.BlockSpec((1, bs, 1), page_map(i))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, QT, C),
        in_specs=(
            [
                pl.BlockSpec((1, TILE_R, r), lambda b, t, c, *_: (b, t, 0)),
                pl.BlockSpec((1, TILE_R, dr), lambda b, t, c, *_: (b, t, 0)),
            ]
            + [c_spec(i) for i in range(P)]
            + [kr_spec(i) for i in range(P)]
            + [sc_spec(i) for i in range(P)]
            + [sc_spec(i) for i in range(P)]
        ),
        out_specs=pl.BlockSpec((1, TILE_R, r), lambda b, t, c, *_: (b, t, 0)),
        scratch_shapes=[
            pltpu.VMEM((TILE_R, r), jnp.float32),
            pltpu.VMEM((TILE_R, 1), jnp.float32),
            pltpu.VMEM((TILE_R, 1), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        _kernel_body(H, bs, P, sm_scale, quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R_pad, r), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=resolve_interpret(interpret),
    )(block_tables.astype(jnp.int32), ctx_lens.astype(jnp.int32), q_start,
      ql2, qr2, *([c_pages] * P), *([kr_pages] * P), *([cs_pages] * P),
      *([krs_pages] * P))

    return out[:, :R].reshape(B, Tq, H, r)
