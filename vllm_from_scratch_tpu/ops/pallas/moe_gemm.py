"""Pallas fused MoE expert kernel: tile-aligned segment GEMM + SwiGLU.

The kernel equivalent of vLLM's FusedMoE Triton grouped GEMM +
moe_align_block_size token sort (SURVEY.md §2b; the reference loops over
experts in Python, 03_moe/mini_moe.py:260-283, and its blog flags the
grouped GEMM as the real design, BLOG_PART3_V2.md:189-221).

How it works (tokens arrive already sorted by expert id, as in
models/moe.moe_ffn):

1. ``moe_align``: each expert's segment is padded to a multiple of TILE_M
   so every tile belongs to exactly ONE expert — the static-shape version
   of moe_align_block_size (padded length M + E*TILE_M is static; the
   scatter/gather positions are traced values).
2. Grid over tiles; the scalar-prefetched ``tile_expert`` map drives the
   BlockSpec index_maps, so each tile's expert weights (gate, up, down —
   int8 or float) are DMA'd HBM->VMEM; consecutive tiles of the same
   expert reuse the resident block (Pallas revisiting).
3. The whole SwiGLU runs in one kernel per tile:
   ``y = (silu(x@Wg) * (x@Wu)) @ Wd`` with the per-output-channel INT8
   scales applied to the f32 accumulators — quantized weights are read
   once and never materialize as bf16 in HBM (the XLA path must
   dequantize before lax.ragged_dot).

Exactness: matches the ragged_dot path to f32 tolerance (interpret-mode
tests); zero rows in tile padding produce zero outputs and are dropped by
the gather-back.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.layers import QuantizedLinear, QuantizedLinear4


def moe_align(
    x_sorted: jax.Array,      # [M, D] sorted by expert id
    group_sizes: jax.Array,   # [E]
    tile_m: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pad each expert segment to a TILE_M multiple.

    Returns (x_pad [M_pad, D], pos [M] scatter positions, tile_expert
    [M_pad // tile_m]).  M_pad = M + E*tile_m is static.
    """
    M, D = x_sorted.shape
    E = group_sizes.shape[0]
    M_pad = M + E * tile_m
    num_tiles = M_pad // tile_m

    gs = group_sizes.astype(jnp.int32)
    starts = jnp.cumsum(gs) - gs                              # [E]
    padded_sizes = ((gs + tile_m - 1) // tile_m) * tile_m
    padded_starts = jnp.cumsum(padded_sizes) - padded_sizes   # [E]

    # Row i of the sorted array belongs to expert eid[i]; place it at the
    # same offset within its expert's padded segment.
    row = jnp.arange(M, dtype=jnp.int32)
    eid = jnp.searchsorted(jnp.cumsum(gs), row, side="right").astype(jnp.int32)
    pos = padded_starts[eid] + (row - starts[eid])            # [M]

    x_pad = jnp.zeros((M_pad, D), x_sorted.dtype).at[pos].set(x_sorted)

    tile_start = jnp.arange(num_tiles, dtype=jnp.int32) * tile_m
    tile_expert = jnp.clip(
        jnp.searchsorted(jnp.cumsum(padded_sizes), tile_start, side="right"),
        0, E - 1,
    ).astype(jnp.int32)
    return x_pad, pos, tile_expert


def _split(w, L, E):
    """(values [L, E, din, dout], scales [L, E, 1, dout] or None).

    Accepts per-layer [E, ...] (L == 1) or layer-stacked [L, E, ...]
    weights; a leading unit axis is added when absent (free reshape).
    For INT4 weights ``din``/``dout`` are the PACKED dims."""
    if isinstance(w, (QuantizedLinear, QuantizedLinear4)):
        q, s = (w.q, w.scale) if isinstance(w, QuantizedLinear) else (w.q4, w.scale)
    else:
        q, s = w, None
    if q.ndim == 3:
        q = q[None]
        s = None if s is None else s[None]
    return q, None if s is None else s.reshape(L, E, 1, -1)


def _kernel(quantized: bool, out_dtype):
    def kern(tile_expert_ref, li_ref, x_ref, wg_ref, wu_ref, wd_ref,
             sg_ref, su_ref, sd_ref, o_ref):
        # Grid (token_tiles, F_blocks): SwiGLU is separable over F columns
        # and the down-projection sums over F, so each F-block contributes
        # an independent partial y accumulated into the revisited output.
        f = pl.program_id(1)

        @pl.when(f == 0)
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)

        x = x_ref[...]                                        # [TILE_M, D]
        g = jax.lax.dot_general(
            x, wg_ref[0, 0].astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        u = jax.lax.dot_general(
            x, wu_ref[0, 0].astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if quantized:
            g = g * sg_ref[0, 0]
            u = u * su_ref[0, 0]
        h = (jax.nn.silu(g) * u).astype(x.dtype)              # [TILE_M, F_blk]
        y = jax.lax.dot_general(
            h, wd_ref[0, 0].astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if quantized:
            y = y * sd_ref[0, 0]
        o_ref[...] += y.astype(out_dtype)

    return kern


def _unpack_nibbles(packed):
    """Packed int8 -> (lo, hi) int8 nibble values in [-7, 7], in-register.

    Arithmetic stays in int32 (Mosaic's native integer vector width); the
    caller casts to the matmul dtype.  No lane/sublane reshuffle — the
    half_in/half_out packings make unpack a pure elementwise op."""
    u = packed.astype(jnp.int32) & 0xFF
    lo = (u & 0xF) - 8
    hi = ((u >> 4) & 0xF) - 8
    return lo, hi


def _kernel4(out_dtype):
    def kern(tile_expert_ref, li_ref, x_ref, wg_ref, wu_ref, wd_ref,
             sg_ref, su_ref, sdlo_ref, sdhi_ref, o_ref):
        """INT4 fused SwiGLU: nibbles unpack in-register and the four
        sub-matmuls consume the contiguous half-split halves —
        g = x_lo @ Wg_lo + x_hi @ Wg_hi (half_in packing over D) and the
        down projection writes its two output halves separately (half_out
        packing over D), so no interleave ever materializes (SURVEY §2b
        FusedMoE INT4/INT8 dequant-in-kernel; VERDICT r2 weak #6).

        The down-projection scale arrives as TWO [1, D/2] operands: a
        single [1, D] block would need a lane-offset slice (``sd[:, D2:]``)
        before broadcasting against y_hi, and Mosaic rejects broadcasts of
        lane-offset vectors ("Invalid input layout", vpad {*,512} — hit on
        the real chip, r3 TPU session)."""
        f = pl.program_id(1)

        @pl.when(f == 0)
        def _init():
            o_ref[...] = jnp.zeros_like(o_ref)

        x = x_ref[...]                                        # [TILE_M, D]
        D2 = x.shape[1] // 2
        x1, x2 = x[:, :D2], x[:, D2:]

        def gemm_in4(w_ref):  # packed [D/2, f_blk] -> [TILE_M, f_blk] f32
            lo, hi = _unpack_nibbles(w_ref[0, 0])
            a = jax.lax.dot_general(
                x1, lo.astype(x.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            b = jax.lax.dot_general(
                x2, hi.astype(x.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return a + b

        g = gemm_in4(wg_ref) * sg_ref[0, 0]
        u = gemm_in4(wu_ref) * su_ref[0, 0]
        h = (jax.nn.silu(g) * u).astype(x.dtype)              # [TILE_M, F_blk]

        d_lo, d_hi = _unpack_nibbles(wd_ref[0, 0])            # [f_blk, D/2]
        y_lo = jax.lax.dot_general(
            h, d_lo.astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y_hi = jax.lax.dot_general(
            h, d_hi.astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = jnp.concatenate(
            [y_lo * sdlo_ref[0, 0], y_hi * sdhi_ref[0, 0]], axis=1)
        o_ref[...] += y.astype(out_dtype)

    return kern


def fused_moe_pallas(
    x_sorted: jax.Array,      # [M, D] sorted by expert id
    group_sizes: jax.Array,   # [E]
    w_gate, w_up, w_down,     # [E, D, F] / [E, F, D], float or QuantizedLinear
    *,
    layer_idx: Optional[jax.Array] = None,
    tile_m: Optional[int] = None,
    f_block: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused SwiGLU expert GEMMs; returns y_sorted [M, D] float32.

    ``layer_idx``: when the weights carry a leading layer axis
    ([L, E, ...]), the scalar-prefetched layer index selects the layer
    INSIDE the kernel's BlockSpecs.  This is how the engine's lax.scan
    avoids materializing each layer's expert stack: slicing scan xs forces
    XLA to copy ~138 MB of weights per layer per step to build contiguous
    custom-call operands (measured 5.2 ms/step at the midsize shape —
    benchmarks/RESULTS.md r2); with the full stacks as operands the kernel
    DMAs pages straight out of the original buffers."""
    from . import resolve_interpret

    M, D = x_sorted.shape
    E = group_sizes.shape[0]
    if tile_m is None:
        # Decode-sized batches (M ~ B*K << E*128) are DMA-bound on the expert
        # weights; a 128-row tile would burn 4x MXU time on padding rows per
        # weight fetch.  Small tiles keep one tile per occupied expert.
        tile_m = 32 if M <= 256 else 128
    quantized = isinstance(w_gate, QuantizedLinear)
    int4 = isinstance(w_gate, QuantizedLinear4)
    if int4:
        assert w_gate.layout == "half_in" and w_up.layout == "half_in", (
            "fused INT4 experts need half_in-packed gate/up "
            "(models.layers.quantize_linear4_half_in)")
        assert w_down.layout == "half_out", (
            "fused INT4 experts need a half_out-packed down projection")

    q0 = w_gate.q if quantized else (w_gate.q4 if int4 else w_gate)
    L = q0.shape[0] if q0.ndim == 4 else 1
    if layer_idx is None:
        layer_idx = jnp.zeros((1,), jnp.int32)
    else:
        layer_idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    wg, sg = _split(w_gate, L, E)
    wu, su = _split(w_up, L, E)
    wd, sd = _split(w_down, L, E)
    F = wg.shape[-1]
    # INT4: gate/up are packed over the input axis (rows = D/2, half_in)
    # and down over the output axis (cols = D/2, half_out); the F axis —
    # the blocked grid axis — keeps its unpacked length in both.
    Dg = wg.shape[-2]           # D (int8/float) or D/2 (int4 half_in)
    Dd = wd.shape[-1]           # D (int8/float) or D/2 (int4 half_out)
    if sg is None:  # uniform arg list for the kernel
        ones_f = jnp.ones((L, E, 1, F), jnp.float32)
        ones_d = jnp.ones((L, E, 1, D), jnp.float32)
        sg, su, sd = ones_f, ones_f, ones_d

    x_pad, pos, tile_expert = moe_align(x_sorted, group_sizes, tile_m)
    num_tiles = x_pad.shape[0] // tile_m

    # Block the F axis so per-step weight blocks fit VMEM (wg+wu+wd blocks
    # double-buffered must stay well under the ~16 MB budget).  Mosaic
    # requires the trailing block dims to be 128-divisible (or the full
    # array dim), so candidates are 128-multiples that divide F; when F
    # itself isn't 128-divisible the only legal choice is F (full dim).
    itemsize = max(1, jnp.dtype(wg.dtype).itemsize)

    def vmem_est(f):
        return 2 * (2 * Dg * f + f * Dd) * itemsize

    # Mosaic's default scoped-VMEM limit is 16 MB; we raise it via
    # CompilerParams (v5e physically has ~128 MB) so F can stay in few large
    # blocks — a fragmented F multiplies grid steps and the per-step
    # pipeline overhead dominates decode (the old 6 MB budget forced F=2816
    # into 11 blocks -> ~176 steps/layer).
    budget = 24 * 1024 * 1024
    candidates = [f for f in range(128, F + 1, 128) if F % f == 0]
    fitting = [f for f in candidates if vmem_est(f) <= budget]
    if f_block is not None:
        f_blk = f_block
    elif fitting:
        f_blk = max(fitting)
    elif candidates:
        f_blk = min(candidates)  # smallest legal block; may exceed budget
    else:
        f_blk = F                # full dim (always legal)
    num_f = F // f_blk

    # INT4's down scale ships as two [.., 1, D/2] halves: the kernel would
    # otherwise lane-slice one [1, D] block at offset D/2 before the y_hi
    # broadcast, which Mosaic rejects (see _kernel4's docstring).
    if int4:
        sd_args = (sd[..., : D // 2], sd[..., D // 2:])
        sd_specs = [
            pl.BlockSpec((1, 1, 1, D // 2), lambda t, f, te, li: (li[0], te[t], 0, 0)),
            pl.BlockSpec((1, 1, 1, D // 2), lambda t, f, te, li: (li[0], te[t], 0, 0)),
        ]
    else:
        sd_args = (sd,)
        sd_specs = [
            pl.BlockSpec((1, 1, 1, D), lambda t, f, te, li: (li[0], te[t], 0, 0)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles, num_f),
        in_specs=[
            pl.BlockSpec((tile_m, D), lambda t, f, te, li: (t, 0)),
            pl.BlockSpec((1, 1, Dg, f_blk), lambda t, f, te, li: (li[0], te[t], 0, f)),
            pl.BlockSpec((1, 1, Dg, f_blk), lambda t, f, te, li: (li[0], te[t], 0, f)),
            pl.BlockSpec((1, 1, f_blk, Dd), lambda t, f, te, li: (li[0], te[t], f, 0)),
            pl.BlockSpec((1, 1, 1, f_blk), lambda t, f, te, li: (li[0], te[t], 0, f)),
            pl.BlockSpec((1, 1, 1, f_blk), lambda t, f, te, li: (li[0], te[t], 0, f)),
        ] + sd_specs,
        out_specs=pl.BlockSpec((tile_m, D), lambda t, f, te, li: (t, 0)),
    )

    y_pad = pl.pallas_call(
        _kernel4(jnp.float32) if int4 else _kernel(quantized, jnp.float32),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((x_pad.shape[0], D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=resolve_interpret(interpret),
    )(tile_expert, layer_idx, x_pad, wg, wu, wd, sg, su, *sd_args)

    return y_pad[pos]
