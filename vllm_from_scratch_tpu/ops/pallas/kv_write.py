"""Pallas fused INT8-quantize + scatter KV-cache write.

The kernel equivalent of vLLM's ``reshape_and_cache`` (SURVEY.md §2b; the
reference simulates it with a torch scatter at mini_vllm.py:422-427): new
K/V rows are quantized to INT8 with per-slot-per-head scales and scattered
into their physical cache rows in ONE pass — the XLA path
(ops.attention.write_kv_cache) lowers to separate amax/scale/round/clip ops
plus four scatters.

Scatter-by-index_map: the grid walks the T new tokens; each step's OUTPUT
BlockSpec picks cache row ``slots[t]`` from the scalar-prefetched slot
mapping, and ``input_output_aliases`` makes the cache operands in-place, so
rows not addressed this call keep their bytes (the pipeline only writes
blocks a grid step visited).

NOT dispatched by default: measured on v5e (T=512 scattered rows, int8,
Hkv=8, D=128) the XLA scatter path is ~2x faster — per-token (1, Hkv, D)
output DMAs are too small to amortize the pipeline per-step cost, and the
quantize arithmetic is trivial next to them.  The kernel exists for the
SURVEY §2b reshape_and_cache parity point and as the base for a future
page-granular writer (slot mappings are page-contiguous for prefill, so
grouping rows per page would cut the DMA count ~block_size x).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import INT8_MAX, _EPS


def _kernel(quantized: bool):
    def kern(slots_ref, k_ref, v_ref, _k_in, _v_in, _ks_in, _vs_in,
             ko_ref, vo_ref, kso_ref, vso_ref):
        # k_ref/v_ref: [1, Hkv, D] new rows; outputs are the cache rows.
        k = k_ref[0].astype(jnp.float32)             # [Hkv, D]
        v = v_ref[0].astype(jnp.float32)
        if quantized:
            ks = jnp.maximum(jnp.max(jnp.abs(k), axis=-1, keepdims=True), _EPS) / INT8_MAX
            vs = jnp.maximum(jnp.max(jnp.abs(v), axis=-1, keepdims=True), _EPS) / INT8_MAX
            ko_ref[0] = jnp.clip(jnp.round(k / ks), -INT8_MAX, INT8_MAX).astype(jnp.int8)
            vo_ref[0] = jnp.clip(jnp.round(v / vs), -INT8_MAX, INT8_MAX).astype(jnp.int8)
            kso_ref[0] = ks
            vso_ref[0] = vs
        else:
            ko_ref[0] = k.astype(ko_ref.dtype)
            vo_ref[0] = v.astype(vo_ref.dtype)
            kso_ref[0] = jnp.ones_like(kso_ref[0])
            vso_ref[0] = jnp.ones_like(vso_ref[0])

    return kern


def write_kv_cache_pallas(
    k_cache: jax.Array,   # [num_slots, Hkv, D] int8 or float
    v_cache: jax.Array,
    k_scale: jax.Array,   # [num_slots, Hkv] f32
    v_scale: jax.Array,
    k_new: jax.Array,     # [T, Hkv, D] float
    v_new: jax.Array,
    slots: jax.Array,     # [T] int32
    *,
    interpret: Optional[bool] = None,
):
    """Returns (k_cache, v_cache, k_scale, v_scale) updated in place."""
    from . import resolve_interpret

    T, Hkv, D = k_new.shape
    S = k_cache.shape[0]
    quantized = k_cache.dtype == jnp.int8

    ks3 = k_scale.reshape(S, Hkv, 1)   # (1, Hkv, 1) blocks satisfy Mosaic's
    vs3 = v_scale.reshape(S, Hkv, 1)   # last-two-dims rule; free view.

    row_in = lambda t, slots: (t, 0, 0)
    row_out = lambda t, slots: (slots[t], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Hkv, D), row_in),       # k_new
            pl.BlockSpec((1, Hkv, D), row_in),       # v_new
            pl.BlockSpec(memory_space=pl.ANY),       # aliased caches (unread)
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, Hkv, D), row_out),
            pl.BlockSpec((1, Hkv, D), row_out),
            pl.BlockSpec((1, Hkv, 1), row_out),
            pl.BlockSpec((1, Hkv, 1), row_out),
        ],
    )

    kq, vq, kso, vso = pl.pallas_call(
        _kernel(quantized),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(ks3.shape, jnp.float32),
            jax.ShapeDtypeStruct(vs3.shape, jnp.float32),
        ],
        # input_output_aliases indexes ALL operands incl. the scalar-prefetch
        # arg: [slots, k_new, v_new, k_cache, v_cache, ks3, vs3] — the four
        # cache operands (3..6) alias outputs 0..3 (in-place row scatter).
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        interpret=resolve_interpret(interpret),
    )(slots.astype(jnp.int32), k_new, v_new, k_cache, v_cache, ks3, vs3)

    return kq, vq, kso.reshape(S, Hkv), vso.reshape(S, Hkv)
