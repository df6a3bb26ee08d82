"""Pallas GQA paged-attention kernel (flash-decoding over KV pages).

TPU-native replacement for the XLA gather path in ops/attention.py —
the real kernel equivalent of the reference's paged_attention_decode /
paged_attention_prefill (ref: 01_paged_attention/paged_attention.py:67-136)
and of vLLM's CUDA PagedAttention kernel the reference only documents
(BLOG_PART2_V2.md:1127-1141).

Design (one kernel for decode Tq=1 and history-aware chunked prefill):

- Grid ``(B, num_chunks)`` where a chunk is P pages (P*block_size tokens,
  sized ~256).  Each of the P pages gets its own BlockSpec whose index_map
  reads the scalar-prefetched block table, so the Pallas pipeline gathers
  the scattered pages HBM->VMEM and double-buffers them; grouping P pages
  per step amortizes per-step pipeline/DMA-issue overhead (a single-page
  grid is ~1.5x SLOWER than XLA at 2k context; this layout is what makes
  the kernel win).
- Online softmax (flash attention): VMEM scratch holds the running
  (acc, m, l) per kv-head; output is written once, at the last chunk.
- INT8 KV dequant is fused: K-scales multiply the score matrix, V-scales
  fold into the probabilities before the PV matmul — int8 pages are read
  exactly once and never materialized as float in HBM.
- Chunks past a request's context length are skipped (``@pl.when``), so
  compute is proportional to true context, not to the padded table width.
- The causal mask uses global positions (``q_start = ctx_len - q_len``),
  the ``diagonal = S-T+1`` trick (ref: 04_mla/mini_mla.py:290-295).

Layouts: q enters as [B, Hkv, R, D] with R = Tq*G (group-major rows, no
in-kernel reshapes); KV pages as [num_blocks, block_size, Hkv, D] — a free
view of the flat-slot cache.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# Target tokens per grid step; pages per step P = ceil(target / block_size).
# On TPU prefer large cache pages (block_size 128-256) so P == 1 and no
# in-kernel concatenation is needed at all.
_CHUNK_TOKENS = 512


def _concat(parts, axis=0):
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def _kernel_body(Hkv: int, G: int, block_size: int, P: int, sm_scale: float,
                 quantized: bool):
    S_c = P * block_size

    def kern(tbl_ref, ctx_ref, qstart_ref, q_ref, *refs):
        k_refs = refs[0:P]                 # each [1, bs, Hkv, D]
        v_refs = refs[P:2 * P]
        ks_refs = refs[2 * P:3 * P]        # each [1, bs, Hkv]
        vs_refs = refs[3 * P:4 * P]
        o_ref = refs[4 * P]                # [1, Hkv, TILE_R, D]
        acc_ref, m_ref, l_ref = refs[4 * P + 1:]
        b = pl.program_id(0)
        qt = pl.program_id(1)              # query-row tile (prefill tiling)
        c = pl.program_id(2)
        R = q_ref.shape[2]                 # rows in this tile

        @pl.when(c == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        ctx = ctx_ref[b]
        qs = qstart_ref[b]
        row0 = qt * R                      # first global query row of the tile
        # Causal skip: this chunk is needed only if its first kv position is
        # not beyond the tile's LAST query token.
        tile_last_pos = qs + (row0 + R - 1) // G

        @pl.when((c * S_c < ctx) & (c * S_c <= tile_last_pos))
        def _chunk():
            # Global positions: query row i is token qs + (row0+i)//G; kv
            # col j is chunk-local token c*S_c + j.
            row_pos = qs + (
                row0 + jax.lax.broadcasted_iota(jnp.int32, (R, S_c), 0)
            ) // G
            kv_pos = c * S_c + jax.lax.broadcasted_iota(jnp.int32, (R, S_c), 1)
            mask = ((kv_pos <= row_pos) & (kv_pos < ctx))[None]    # [1, R, S_c]

            def dequant_t(ref, s_ref):
                # [bs, Hkv, D] page -> head-major [Hkv, bs, D], scale
                # row-folded in (avoids lane-vector scale math).
                x = ref[0].astype(jnp.float32)                     # [bs, Hkv, D]
                if quantized:
                    x = x * s_ref[0][:, :, None]                   # [bs, Hkv, 1]
                return jnp.swapaxes(x, 0, 1)                       # [Hkv, bs, D]

            kh = _concat(
                [dequant_t(k_refs[i], ks_refs[i]) for i in range(P)], axis=1
            )                                                      # [Hkv, S_c, D]
            q = q_ref[0]                                           # [Hkv, R, D]
            # One batched matmul over all kv heads (Mosaic lowers the batch
            # dim natively — measurably faster than a per-head unroll).
            s = jax.lax.dot_general(
                q, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * sm_scale                                           # [Hkv, R, S_c]
            s = jnp.where(mask, s, _NEG_INF)

            m_prev = m_ref[...]                                    # [Hkv, R, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)           # [Hkv, R, S_c]
            m_ref[...] = m_new
            l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=2, keepdims=True)

            vh = _concat(
                [dequant_t(v_refs[i], vs_refs[i]) for i in range(P)], axis=1
            )
            pv = jax.lax.dot_general(
                p, vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                                      # [Hkv, R, D]
            acc_ref[...] = acc_ref[...] * alpha + pv

        @pl.when(c == pl.num_programs(2) - 1)
        def _finish():
            o_ref[0] = acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)

    return kern


def paged_attention_pallas(
    q: jax.Array,             # [B, Tq, Hq, D]
    k_cache: jax.Array,       # [num_slots, Hkv, D] int8 or float
    v_cache: jax.Array,
    k_scale: jax.Array,       # [num_slots, Hkv] f32
    v_scale: jax.Array,
    block_tables: jax.Array,  # [B, N] int32
    ctx_lens: jax.Array,      # [B] int32
    q_lens: Optional[jax.Array],
    *,
    block_size: int,
    sm_scale: float,
    pages_per_step: Optional[int] = None,
    tile_r: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash paged attention; returns [B, Tq, Hq, D] float32.

    Query rows (R = Tq*G) beyond ``tile_r`` are tiled over a third grid
    dimension with causal chunk skipping, so big prefill chunks run with
    bounded VMEM (O(tile_r * D) accumulators) instead of falling back."""
    from . import resolve_interpret

    B, Tq, Hq, D = q.shape
    Hkv = k_cache.shape[1]
    G = Hq // Hkv
    R = Tq * G
    N = block_tables.shape[1]
    nb = k_cache.shape[0] // block_size
    bs = block_size
    quantized = k_cache.dtype == jnp.int8

    P = pages_per_step or max(1, min(N, -(-_CHUNK_TOKENS // bs)))
    if N % P:  # pad the table width with null pages (masked by ctx_lens)
        block_tables = jnp.pad(block_tables, ((0, 0), (0, P - N % P)))
        N = block_tables.shape[1]
    C = N // P

    if q_lens is None:
        q_lens = jnp.full((B,), Tq, dtype=jnp.int32)
    q_start = (ctx_lens - q_lens).astype(jnp.int32)

    # [B, Hkv, R, D] group-major query rows.
    qt = (
        q.astype(jnp.float32)
        .reshape(B, Tq, Hkv, G, D)
        .transpose(0, 2, 1, 3, 4)
        .reshape(B, Hkv, R, D)
    )
    TILE_R = min(R, tile_r)
    R_pad = -(-R // TILE_R) * TILE_R
    if R_pad != R:  # pad rows; garbage outputs are sliced off below
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, R_pad - R), (0, 0)))
    QT = R_pad // TILE_R
    k_pages = k_cache.reshape(nb, bs, Hkv, D)
    v_pages = v_cache.reshape(nb, bs, Hkv, D)
    ks_pages = k_scale.reshape(nb, bs, Hkv)
    vs_pages = v_scale.reshape(nb, bs, Hkv)

    def page_map(i):
        return lambda b, t, c, tbl, ctx, qs: (tbl[b, c * P + i], 0, 0, 0)

    def scale_map(i):
        return lambda b, t, c, tbl, ctx, qs: (tbl[b, c * P + i], 0, 0)

    page_spec = lambda i: pl.BlockSpec((1, bs, Hkv, D), page_map(i))
    sc_spec = lambda i: pl.BlockSpec((1, bs, Hkv), scale_map(i))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, QT, C),
        in_specs=(
            [pl.BlockSpec((1, Hkv, TILE_R, D), lambda b, t, c, *_: (b, 0, t, 0))]
            + [page_spec(i) for i in range(P)]
            + [page_spec(i) for i in range(P)]
            + [sc_spec(i) for i in range(P)]
            + [sc_spec(i) for i in range(P)]
        ),
        out_specs=pl.BlockSpec(
            (1, Hkv, TILE_R, D), lambda b, t, c, *_: (b, 0, t, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv, TILE_R, D), jnp.float32),
            pltpu.VMEM((Hkv, TILE_R, 1), jnp.float32),
            pltpu.VMEM((Hkv, TILE_R, 1), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        _kernel_body(Hkv, G, bs, P, sm_scale, quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, R_pad, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=resolve_interpret(interpret),
    )(block_tables.astype(jnp.int32), ctx_lens.astype(jnp.int32), q_start,
      qt, *([k_pages] * P), *([v_pages] * P), *([ks_pages] * P),
      *([vs_pages] * P))

    # [B, Hkv, R_pad, D] -> [B, Tq, Hq, D]
    return (
        out[:, :, :R]
        .reshape(B, Hkv, Tq, G, D).transpose(0, 2, 1, 3, 4).reshape(B, Tq, Hq, D)
    )
