"""The serving engine: scheduler + jitted model step + sampler.

Equivalent of the reference's ``MiniVLLM`` (ref: 05_mini_vllm/mini_vllm.py:
641-783) with the TPU execution model:

- One **jitted step function** per (batch, chunk, table-width) bucket —
  shapes are padded up to powers of two so XLA compiles a handful of
  programs and every later step replays them (the TPU analogue of CUDA
  graphs, BLOG_PART3_V2.md:1630-1645).
- The KV cache is a layer-stacked device array pytree **donated** through
  the step, so pages update in place; the host never sees KV bytes.
- The scheduler's Python output is staged into dense int32 numpy arrays;
  pad tokens write to the null block and pad rows carry ctx_len 0.
- Decode items and prefill chunks run as (at most) two bucketed calls per
  step: decodes batch at Tq=1, prefill chunks at Tq=chunk-bucket, so decode
  rows never pay chunk-width compute.
"""

from __future__ import annotations

import os
import time
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import transformer
from ..models.transformer import ModelBatch
from ..ops.rejection import propose_ngram, rejection_sample
from ..ops.sampling import (
    filtered_probs, make_sampling_state, sample, sample_with_probs,
    sampling_mode,
)
from .config import EngineConfig, SamplingParams
from .kv_cache_manager import KVCacheManager, cdiv
from .request import Request
from .scheduler import ScheduledRequest, Scheduler


def _params_quantized(params) -> bool:
    from ..models.layers import QuantizedLinear, QuantizedLinear4

    found = False

    def probe(x):
        nonlocal found
        if isinstance(x, (QuantizedLinear, QuantizedLinear4)):
            found = True
        return None

    jax.tree.map(
        probe, params,
        is_leaf=lambda x: isinstance(x, (QuantizedLinear, QuantizedLinear4)),
    )
    return found


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _pow2_down(n: int) -> int:
    """Largest power of two <= n (n >= 1)."""
    p = 1
    while p * 2 <= n:
        p *= 2
    return p


def _unpack_batch(packed, T: int) -> ModelBatch:
    """Inverse of _run_group's packing (layout documented there)."""
    N = packed.shape[1] - 3 * T - 3
    return ModelBatch(
        tokens=packed[:, :T],
        positions=packed[:, T:2 * T],
        slots=packed[:, 2 * T:3 * T],
        block_tables=packed[:, 3 * T:3 * T + N],
        ctx_lens=packed[:, 3 * T + N],
        q_lens=packed[:, 3 * T + N + 1],
    )


class LLMEngine:
    def __init__(self, config: EngineConfig, params: Optional[dict] = None):
        self.config = config
        mcfg, ccfg = config.model, config.cache
        # Context parallelism (parallel/cp_serving.py): host-side block
        # bookkeeping uses VIRTUAL blocks of block_size * cp tokens — one
        # virtual id addresses one physical block on every cp rank
        # (cp_virtual_block_size, BLOG_PART3_V2.md:709-768).  num_blocks is
        # per-rank, so capacity scales cp x.
        # MLA latents (cp_mla_attention) and GQA K/V pages (cp_gqa_attention)
        # both serve context-parallel; the flash-merged partial-attention
        # design is head-layout agnostic.
        cp = config.parallel.cp_size
        self.block_size = ccfg.block_size * cp  # virtual (host-side slots)

        self.kv_mgr = KVCacheManager(
            ccfg.num_blocks, self.block_size, ccfg.enable_prefix_caching
        )
        self.scheduler = Scheduler(config.scheduler, self.kv_mgr)
        # SWAP-mode preemption backend (scheduler._do_preempt /
        # preemption_mode="swap"): the engine owns the cache arrays, so it
        # implements the page movement (swap_out / swap_in below).
        self.scheduler.swapper = self

        key = jax.random.PRNGKey(config.seed)
        pkey, self._rng = jax.random.split(key)
        self.params = params if params is not None else transformer.init_params(pkey, mcfg)
        self.cache = transformer.init_cache(
            mcfg, ccfg.num_blocks * cp, ccfg.block_size, ccfg.kv_quant
        )

        # EPLB (parallel/eplb.py): identity expert_map joins the param tree
        # BEFORE sharding/quantization so every path sees a stable pytree.
        self._eplb_on = config.parallel.eplb_interval > 0 and mcfg.is_moe
        if self._eplb_on and "expert_map" not in self.params["layers"]["moe"]:
            emap = jnp.tile(
                jnp.arange(mcfg.num_experts, dtype=jnp.int32),
                (mcfg.num_layers, 1),
            )
            layers = dict(self.params["layers"])
            layers["moe"] = {**layers["moe"], "expert_map": emap}
            self.params = {**self.params, "layers": layers}
        if self._eplb_on:
            self._eplb_counts = np.zeros(
                (mcfg.num_layers, mcfg.num_experts), np.int64)
            self._eplb_slot_to_logical = np.tile(
                np.arange(mcfg.num_experts), (mcfg.num_layers, 1))
            self._eplb_steps = 0

        # Multi-chip: build the mesh and lay out params/cache (GSPMD).
        self.mesh = None
        if config.parallel.world_size > 1:
            from ..parallel import sharding as shd

            self.mesh = shd.make_mesh(config.parallel)
            self.params = shd.shard_params(
                self.params, mcfg, self.mesh, config.parallel.mla_kv)
            self.cache = shd.shard_cache(
                self.cache, mcfg, self.mesh, config.parallel.mla_kv)

        # Weight-only INT8/INT4 (after sharding: quantize ops run under GSPMD,
        # so int8 weights + scales inherit the float weights' layouts).
        # Checkpoint-restored params may already be quantized — don't redo.
        if (config.quant.weight_quant in ("int8", "int4")
                and not _params_quantized(self.params)):
            self.params = transformer.quantize_params(
                self.params, mcfg,
                bits=4 if config.quant.weight_quant == "int4" else 8,
                scope=config.quant.scope,
            )

        # Widest possible block table row (bucketed down per call).
        self.max_blocks_per_seq = min(
            cdiv(mcfg.max_position, self.block_size), ccfg.num_blocks
        )
        # Pinned decode-group row count (see _pack_group(decode=True)).
        _dp = config.parallel.dp_size
        self._bd_pin = _dp * _next_pow2(
            cdiv(config.scheduler.max_num_seqs, _dp))
        # Prefill token-bucket floor (see _pack_group): tail chunks pad up
        # into this bucket instead of minting tiny per-size programs.
        self._tp_floor = min(
            _next_pow2(max(config.scheduler.chunk_quantum, 1)),
            _next_pow2(config.scheduler.max_num_batched_tokens))

        mesh = self.mesh
        ep_dispatch = config.parallel.ep_dispatch
        mla_kv = config.parallel.mla_kv
        cp_attn = config.parallel.cp_attn
        use_pp = mesh is not None and "pp" in mesh.shape
        eplb_on = self._eplb_on
        _no_counts = jnp.zeros((0,), jnp.int32)

        # Host->device staging rides ONE packed int32 array per step and the
        # RNG key derives in-graph from a seed column (fold_in on a baked
        # base key) — on a remote-tunnel chip every extra small transfer or
        # host-side jax.random.split costs ~10 ms of per-sync latency.
        base_key = jax.random.PRNGKey(config.seed + 1)
        self._step_seed = 0

        def _fwd(params, cache, batch):
            if use_pp:
                from ..parallel.pp import pipeline_forward

                return pipeline_forward(
                    params, cache, batch, mcfg, mesh,
                    block_size=ccfg.block_size, cp_attn=cp_attn,
                )
            return transformer.forward(
                params, cache, batch, mcfg, block_size=ccfg.block_size, mesh=mesh,
                ep_dispatch=ep_dispatch, mla_kv=mla_kv, cp_attn=cp_attn,
            )

        def _fwd_counting(params, cache, batch):
            """Forward that also reports [L, E] router loads (EPLB signal).
            Under pp each stage counts its own layers (bubble-masked) and
            the counts concatenate over the "pp" axis — EPLB composes with
            pipeline parallelism (VERDICT r2 weak #5)."""
            if use_pp:
                from ..parallel.pp import pipeline_forward

                return pipeline_forward(
                    params, cache, batch, mcfg, mesh,
                    block_size=ccfg.block_size, cp_attn=cp_attn,
                    collect_expert_counts=True,
                )
            return transformer.forward(
                params, cache, batch, mcfg, block_size=ccfg.block_size, mesh=mesh,
                ep_dispatch=ep_dispatch, mla_kv=mla_kv, cp_attn=cp_attn,
                collect_expert_counts=True,
            )

        def _step(params, cache, packed, sstate, T: int, mode: str):
            """packed [B, 3T + N + 3] int32 rows:
            [tokens | positions | slots | tables | ctx | q_len | seed]."""
            B = packed.shape[0]
            N = packed.shape[1] - 3 * T - 3
            batch = ModelBatch(
                tokens=packed[:, :T],
                positions=packed[:, T:2 * T],
                slots=packed[:, 2 * T:3 * T],
                block_tables=packed[:, 3 * T:3 * T + N],
                ctx_lens=packed[:, 3 * T + N],
                q_lens=packed[:, 3 * T + N + 1],
            )
            skey = jax.random.fold_in(base_key, packed[0, 3 * T + N + 2])
            if eplb_on:
                logits, cache, counts = _fwd_counting(params, cache, batch)
            else:
                logits, cache = _fwd(params, cache, batch)
                counts = _no_counts
            tokens = sample(logits, sstate, skey, mode)
            return tokens, cache, counts

        self._step_fn = jax.jit(_step, donate_argnums=(1,),
                                static_argnums=(4, 5))

        # Async chain buffer: every async dispatch publishes its rows'
        # latest tokens into a FIXED-size, FIXED-layout device vector
        # ([prefill rows at 0.._bd_pin) | decode rows at _bd_pin..2*_bd_pin)],
        # possible because admissions per step <= max_num_seqs) that the
        # next dispatch reads through ``src``.  A variable-length chain
        # (the r3 first cut) made every consumer program specialize on the
        # PREVIOUS step's padding too — the cross-product compiled fresh
        # multi-second programs all through a serving window even after
        # warmup (steplog: 5-7 s stalls on every prefill arrival).
        bd_pin = self._bd_pin
        chain_len = 2 * bd_pin

        def _make_chain(tokens_p, tokens_d):
            chain = jnp.zeros((chain_len,), jnp.int32)
            chain = jax.lax.dynamic_update_slice(chain, tokens_p, (0,))
            return jax.lax.dynamic_update_slice(chain, tokens_d, (bd_pin,))

        def _step_mixed(params, cache, packed_p, packed_d, prev_toks, src,
                        sstate, Tp: int, mode: str):
            """ONE fused prefill+decode step (transformer.forward_mixed):
            weights stream once for both groups.  Returns (tokens
            [Bp_pad + Bd_pad] (prefill rows first), chain [2*_bd_pin]).

            ``prev_toks``/``src``: async scheduling — decode rows whose
            current token was sampled by the still-unsynced previous step
            read it from that step's on-device output (src[j] = index into
            prev_toks, the fixed chain layout; -1 = host-packed token)."""
            bp = _unpack_batch(packed_p, Tp)
            bd = _unpack_batch(packed_d, 1)
            tok0 = jnp.where(
                src >= 0,
                prev_toks[jnp.clip(src, 0, prev_toks.shape[0] - 1)],
                bd.tokens[:, 0],
            )
            bd = bd._replace(tokens=tok0[:, None])
            skey = jax.random.fold_in(base_key, packed_p[0, -1])  # seed col
            if eplb_on:
                lp, ld, cache, counts = transformer.forward_mixed(
                    params, cache, bp, bd, mcfg, block_size=ccfg.block_size,
                    mesh=mesh, ep_dispatch=ep_dispatch, mla_kv=mla_kv, cp_attn=cp_attn,
                    collect_expert_counts=True)
            else:
                lp, ld, cache = transformer.forward_mixed(
                    params, cache, bp, bd, mcfg, block_size=ccfg.block_size,
                    mesh=mesh, ep_dispatch=ep_dispatch, mla_kv=mla_kv,
                    cp_attn=cp_attn)
                counts = _no_counts
            tokens = sample(jnp.concatenate([lp, ld], axis=0), sstate, skey,
                            mode)
            Bp = packed_p.shape[0]
            chain = _make_chain(tokens[:Bp], tokens[Bp:])
            return tokens, chain, cache, counts

        # Mixed step composes with tp (GSPMD) and EPLB; pp has its own
        # runner, dp shards batch rows (the concat would cross shards), cp
        # reshapes the cache, and draft-model spec keeps its own prefill.
        self._mixed_ok = (
            not use_pp
            and config.parallel.dp_size == 1
            and config.parallel.cp_size == 1
            and config.spec is None
        )
        self._step_mixed_fn = jax.jit(_step_mixed, donate_argnums=(1,),
                                      static_argnums=(7, 8))
        # Async scheduling (prefill/mixed dispatch-before-sync) rides the
        # mixed step's override operands; same composition envelope.
        # _pending_q holds up to async_depth in-flight steps: depth >= 2
        # keeps dispatching while the oldest step's D2H result is still in
        # flight — over the axon tunnel a result fetch costs a ~29 ms RTT
        # on top of the ~24 ms chunk compute, so a depth-1 pipeline is
        # fetch-bound (measured 51 ms/step; r3 prefill host trace).
        self._async_ok = self._mixed_ok and config.scheduler.async_scheduling
        self._async_depth = max(1, config.scheduler.async_depth)
        self._pending_q: deque = deque()
        self._dummy_prev = jnp.zeros((chain_len,), jnp.int32)
        # Pure-prefill async steps publish their chain via this tiny pad
        # program (specializes per B_pad — a handful of trivial compiles).
        self._chain_pad_fn = jax.jit(
            lambda t: jnp.zeros((chain_len,), jnp.int32).at[:t.shape[0]].set(t))
        # NOTE (r3, measured): a D2H result fetch over the axon tunnel
        # costs a ~30 ms round trip whenever device work is queued
        # (copy_to_host_async only completes once the queue drains), and a
        # background fetch thread makes it WORSE (the early fetch RPC
        # head-of-line blocks the next dispatch's H2D: TTFT 123 -> 352 ms).
        # Commits therefore fetch synchronously; the fix for fetch-bound
        # phases is fewer, bigger steps (decode macro scan; mixed macro),
        # not more transfer overlap.

        def _decode_scan(params, cache, tok0, packed, sstate, K: int, mode: str):
            """K autoregressive decode iterations in one compiled program.

            tok0 [B]: the current token per row — a host upload for the
            first macro, or the PREVIOUS macro's on-device last sample in
            the async pipeline (no host sync between macros).
            packed [B, 1 + N + K + 1] int32 rows: [pos0 | tables | slots_k |
            seed]; returns tokens [K, B] (token k is sampled after writing
            KV for position pos0+k).
            """
            N = packed.shape[1] - 1 - K - 1
            pos0 = packed[:, 0]
            tables = packed[:, 1:1 + N]
            slots_k = packed[:, 1 + N:1 + N + K]
            skey = jax.random.fold_in(base_key, packed[0, 1 + N + K])

            def body(carry, k):
                cache, tok, pos = carry
                b = ModelBatch(
                    tokens=tok[:, None],
                    positions=pos[:, None],
                    slots=slots_k[:, k][:, None],
                    block_tables=tables,
                    ctx_lens=pos + 1,
                    q_lens=jnp.ones_like(pos),
                )
                if eplb_on:
                    logits, cache, counts = _fwd_counting(params, cache, b)
                else:
                    logits, cache = _fwd(params, cache, b)
                    counts = _no_counts
                tok2 = sample(logits, sstate, jax.random.fold_in(skey, k), mode)
                return (cache, tok2, pos + 1), (tok2, counts)

            (cache, _, _), (toks, counts_k) = jax.lax.scan(
                body, (cache, tok0, pos0), jnp.arange(K)
            )
            return toks, cache, counts_k.sum(axis=0)

        self._decode_scan_fn = jax.jit(
            _decode_scan, donate_argnums=(1,), static_argnums=(5, 6))

        def _mixed_macro(params, cache, packed_p, packed_d, prev_toks, src,
                         sstate, Tp: int, K: int, mode: str):
            """ONE compiled program = one fused prefill+decode step, then
            K-1 further decode iterations (lax.scan): under continuous
            serving, plain mixed steps give decode rows ONE token per
            prefill chunk (~40+ ms/token ITL) and pay a result-fetch RTT
            per token; the macro amortizes both K-fold, the mixed analogue
            of _decode_scan.

            packed_d rows: [pos0 | tables(N) | slots(K) | tok0 | seed].
            Returns (toks_flat [Bp+Bd + (K-1)*Bd], chain [2*_bd_pin], cache,
            counts): toks_flat is the single fetch target (iteration-0
            tokens first, then decode iterations row-major); chain carries
            each row's LATEST token in the fixed chain layout (_make_chain)
            for the next dispatch's src chaining."""
            Bp = packed_p.shape[0]
            bp = _unpack_batch(packed_p, Tp)
            N = packed_d.shape[1] - 1 - K - 2
            pos0 = packed_d[:, 0]
            tables = packed_d[:, 1:1 + N]
            slots_k = packed_d[:, 1 + N:1 + N + K]
            tok_host = packed_d[:, 1 + N + K]
            skey = jax.random.fold_in(base_key, packed_d[0, 1 + N + K + 1])
            tok0 = jnp.where(
                src >= 0,
                prev_toks[jnp.clip(src, 0, prev_toks.shape[0] - 1)],
                tok_host,
            )
            bd0 = ModelBatch(
                tokens=tok0[:, None], positions=pos0[:, None],
                slots=slots_k[:, 0][:, None], block_tables=tables,
                ctx_lens=pos0 + 1, q_lens=jnp.ones_like(pos0),
            )
            if eplb_on:
                lp, ld, cache, counts0 = transformer.forward_mixed(
                    params, cache, bp, bd0, mcfg, block_size=ccfg.block_size,
                    mesh=mesh, ep_dispatch=ep_dispatch, mla_kv=mla_kv, cp_attn=cp_attn,
                    collect_expert_counts=True)
            else:
                lp, ld, cache = transformer.forward_mixed(
                    params, cache, bp, bd0, mcfg, block_size=ccfg.block_size,
                    mesh=mesh, ep_dispatch=ep_dispatch, mla_kv=mla_kv,
                    cp_attn=cp_attn)
                counts0 = _no_counts
            tok_full0 = sample(jnp.concatenate([lp, ld], axis=0), sstate,
                               jax.random.fold_in(skey, 0), mode)
            sstate_d = type(sstate)(*(x[Bp:] for x in sstate))

            def body(carry, k):
                cache, tok, pos = carry
                b = ModelBatch(
                    tokens=tok[:, None],
                    positions=pos[:, None],
                    slots=slots_k[:, k][:, None],
                    block_tables=tables,
                    ctx_lens=pos + 1,
                    q_lens=jnp.ones_like(pos),
                )
                if eplb_on:
                    logits, cache, counts = _fwd_counting(params, cache, b)
                else:
                    logits, cache = _fwd(params, cache, b)
                    counts = _no_counts
                tok2 = sample(logits, sstate_d,
                              jax.random.fold_in(skey, k), mode)
                return (cache, tok2, pos + 1), (tok2, counts)

            (cache, tok_last, _), (toks_rest, counts_k) = jax.lax.scan(
                body, (cache, tok_full0[Bp:], pos0 + 1), jnp.arange(1, K))
            toks_flat = jnp.concatenate([tok_full0, toks_rest.reshape(-1)])
            chain = _make_chain(tok_full0[:Bp], tok_last)
            counts = counts0 + counts_k.sum(axis=0) if eplb_on else _no_counts
            return toks_flat, chain, cache, counts

        self._mixed_macro_fn = jax.jit(
            _mixed_macro, donate_argnums=(1,), static_argnums=(7, 8, 9))

        # Sampling state cached on device, re-staged only when the batch
        # composition or sampling params change.
        self._sstate_key = None
        self._sstate_dev = None
        # Async decode pipeline: the in-flight macro-step (dispatched but
        # not yet synced); see _pump_async.
        self._pending_macro: Optional[dict] = None
        # VFS_MACRO_TRACE=1: per-macro phase timings (cont dispatch / result
        # fetch / scheduler update) appended as dicts — the host-overhead
        # diagnosis harness (benchmarks/probe_macro.py).
        self._macro_log = [] if os.environ.get("VFS_MACRO_TRACE") else None

        # ---- speculative decoding (optional) ---------------------------
        self.draft_params = None
        self.draft_cache = None
        if config.spec is not None and config.spec.method == "ngram":
            # Draft-free prompt lookup: host proposes, ONE target forward
            # verifies, the exact rejection sampler consumes a one-hot draft
            # distribution (accept prob = p_target(draft)).  Composes with
            # pipeline parallelism: the verify is just a (K+1)-token forward,
            # which pipeline_forward runs like any chunk.
            def _ngram_verify(pt, ct, tok0, pos0, tables, slots_k, drafts,
                              sstate, skey):
                K = slots_k.shape[1] - 1
                ver_tokens = jnp.concatenate([tok0[:, None], drafts], axis=1)
                ver_pos = pos0[:, None] + jnp.arange(K + 1)[None, :]
                b = ModelBatch(
                    tokens=ver_tokens, positions=ver_pos, slots=slots_k,
                    block_tables=tables, ctx_lens=pos0 + K + 1,
                    q_lens=jnp.full_like(pos0, K + 1),
                )
                if use_pp:
                    from ..parallel.pp import pipeline_forward

                    all_logits, ct = pipeline_forward(
                        pt, ct, b, mcfg, mesh, block_size=ccfg.block_size,
                        cp_attn=cp_attn, return_all_logits=True,
                    )
                else:
                    all_logits, ct = transformer.forward(
                        pt, ct, b, mcfg, block_size=ccfg.block_size, mesh=mesh,
                        ep_dispatch=ep_dispatch, mla_kv=mla_kv, cp_attn=cp_attn,
                        return_all_logits=True,
                    )
                target_probs = filtered_probs(all_logits, sstate)
                draft_probs = jax.nn.one_hot(
                    drafts, mcfg.vocab_size, dtype=jnp.float32)
                out, n_acc = rejection_sample(drafts, draft_probs,
                                              target_probs, skey)
                return out, n_acc, ct

            self._ngram_verify_fn = jax.jit(_ngram_verify, donate_argnums=(1,))
        elif config.spec is not None:
            # Draft-MODEL spec decode composes with pipeline parallelism by
            # SPLITTING the fused step: the draft model is small, so its
            # K-iteration lax.scan runs replicated outside the pipeline
            # (sharding it over stages would bubble K times per token);
            # only the single (K+1)-token verify forward pipelines — via
            # pipeline_forward(return_all_logits=True), exactly like the
            # ngram path above.  Without pp the two halves stay composed in
            # ONE jit (one dispatch, unchanged numerics).
            dcfg = config.spec.draft
            assert dcfg is not None and dcfg.vocab_size == mcfg.vocab_size
            dkey = jax.random.PRNGKey(config.seed + 17)
            self.draft_params = transformer.init_params(dkey, dcfg)
            self.draft_cache = transformer.init_cache(
                dcfg, ccfg.num_blocks, ccfg.block_size, ccfg.kv_quant
            )

            def _draft_prefill(dparams, dcache, batch):
                _, dcache = transformer.forward(
                    dparams, dcache, batch, dcfg, block_size=ccfg.block_size
                )
                return dcache

            self._draft_prefill_fn = jax.jit(_draft_prefill, donate_argnums=(1,))

            def _draft_scan(pd, cd, tok0, pos0, tables, slots_k, sstate, skey):
                """Draft K tokens with the small model (+1 KV-only step).

                slots_k: [B, K+1] slots for positions pos0..pos0+K.  Returns
                (drafts [B, K], draft_probs [B, K, V], new draft cache).
                """
                K = slots_k.shape[1] - 1

                def dbody(carry, i):
                    cd, tok, pos = carry
                    b = ModelBatch(
                        tokens=tok[:, None], positions=pos[:, None],
                        slots=slots_k[:, i][:, None], block_tables=tables,
                        ctx_lens=pos + 1, q_lens=jnp.ones_like(pos),
                    )
                    logits, cd = transformer.forward(
                        pd, cd, b, dcfg, block_size=ccfg.block_size
                    )
                    dtok, dprobs = sample_with_probs(
                        logits, sstate, jax.random.fold_in(skey, i)
                    )
                    return (cd, dtok, pos + 1), (dtok, dprobs)

                # K+1 iterations: the last one only writes d_K's KV into the
                # draft cache so the next spec step has full draft history.
                (cd, _, _), (dtoks, dprobs) = jax.lax.scan(
                    dbody, (cd, tok0, pos0), jnp.arange(K + 1)
                )
                drafts = dtoks[:K].T                      # [B, K]
                draft_probs = dprobs[:K].transpose(1, 0, 2)  # [B, K, V]
                return drafts, draft_probs, cd

            def _spec_verify(pt, ct, tok0, pos0, tables, slots_k, drafts,
                             draft_probs, sstate, skey):
                """ONE target forward over [token0 | drafts], reject-sample.

                Returns (tokens [B, K+1], num_accepted [B], new target cache).
                """
                K = slots_k.shape[1] - 1
                ver_tokens = jnp.concatenate([tok0[:, None], drafts], axis=1)
                ver_pos = pos0[:, None] + jnp.arange(K + 1)[None, :]
                b = ModelBatch(
                    tokens=ver_tokens, positions=ver_pos, slots=slots_k,
                    block_tables=tables, ctx_lens=pos0 + K + 1,
                    q_lens=jnp.full_like(pos0, K + 1),
                )
                if use_pp:
                    from ..parallel.pp import pipeline_forward

                    all_logits, ct = pipeline_forward(
                        pt, ct, b, mcfg, mesh, block_size=ccfg.block_size,
                        cp_attn=cp_attn, return_all_logits=True,
                    )                                      # [B, K+1, V]
                else:
                    all_logits, ct = transformer.forward(
                        pt, ct, b, mcfg, block_size=ccfg.block_size, mesh=mesh,
                        ep_dispatch=ep_dispatch, mla_kv=mla_kv, cp_attn=cp_attn,
                        return_all_logits=True,
                    )                                      # [B, K+1, V]
                target_probs = filtered_probs(all_logits, sstate)
                out, n_acc = rejection_sample(
                    drafts, draft_probs, target_probs, jax.random.fold_in(skey, 777)
                )
                return out, n_acc, ct

            if use_pp:
                # Two dispatches per spec step: replicated draft scan, then
                # the pipelined verify (draft_probs flows device-to-device).
                self._spec_step_fn = None
                self._draft_scan_fn = jax.jit(_draft_scan, donate_argnums=(1,))
                self._spec_verify_fn = jax.jit(_spec_verify, donate_argnums=(1,))
            else:
                def _spec_step(pt, pd, ct, cd, tok0, pos0, tables, slots_k,
                               sstate, skey):
                    drafts, draft_probs, cd = _draft_scan(
                        pd, cd, tok0, pos0, tables, slots_k, sstate, skey)
                    out, n_acc, ct = _spec_verify(
                        pt, ct, tok0, pos0, tables, slots_k, drafts,
                        draft_probs, sstate, skey)
                    return out, n_acc, ct, cd

                self._spec_step_fn = jax.jit(_spec_step, donate_argnums=(2, 3))

        self._next_req_id = 0
        # metrics
        self.metrics: Dict[str, float] = {
            "num_steps": 0,
            "num_generated_tokens": 0,
            "num_prefill_tokens": 0,
        }
        # TTFT tracking with BOUNDED state: arrival entries pop at first
        # token, and finished TTFTs live in a fixed-size window — a
        # long-running server must not accumulate per-request history
        # (same leak class the scheduler's requests-map fix closed).
        self._arrival: Dict[int, float] = {}
        self._ttfts: deque = deque(maxlen=100_000)

    # ---- EPLB -----------------------------------------------------------------

    def _eplb_accumulate(self, counts) -> None:
        if self._eplb_on and counts.size:
            self._eplb_counts += np.asarray(counts)

    def _eplb_rebalance(self) -> None:
        """Re-pack experts onto ranks by measured load; permute the weight
        stacks and swap the logical->slot map — output-identity (eplb.py)."""
        from ..parallel.eplb import balance, permute_layered

        R = self.config.parallel.eplb_ranks or max(self.config.parallel.tp_size, 1)
        if R <= 1:
            return
        L, E = self._eplb_counts.shape
        # perms[l, i] = logical expert placed at physical slot i of layer l.
        perms = np.stack(
            [balance(self._eplb_counts[l], R) for l in range(L)]
        )
        # Gather index relative to the CURRENT physical arrangement.
        cur_slot_of = np.argsort(self._eplb_slot_to_logical, axis=1)
        idx = np.take_along_axis(cur_slot_of, perms, axis=1)

        old_moe = self.params["layers"]["moe"]
        new_moe = permute_layered(old_moe, idx)
        new_map = jnp.asarray(np.argsort(perms, axis=1), jnp.int32)
        # Keep device layouts: re-pin every permuted leaf to its old sharding.
        for k in ("w_gate", "w_up", "w_down"):
            new_moe[k] = jax.tree.map(
                lambda n, o: jax.device_put(n, o.sharding), new_moe[k], old_moe[k]
            )
        new_moe["expert_map"] = jax.device_put(
            new_map, old_moe["expert_map"].sharding)

        layers = dict(self.params["layers"])
        layers["moe"] = new_moe
        self.params = {**self.params, "layers": layers}
        self._eplb_slot_to_logical = perms
        self._eplb_counts[:] = 0
        self.metrics["eplb_rebalances"] = self.metrics.get("eplb_rebalances", 0) + 1

    def eplb_max_rank_load_frac(self) -> float:
        """Max-rank share of total routed load under the CURRENT placement
        (1/R = perfectly balanced), from the counts gathered this window."""
        R = self.config.parallel.eplb_ranks or max(self.config.parallel.tp_size, 1)
        # Aggregate over layers with each layer's own placement.
        per_rank = self._eplb_counts.shape[1] // R
        total = max(self._eplb_counts.sum(), 1)
        rank_load = np.zeros(R)
        for l in range(self._eplb_counts.shape[0]):
            sl = self._eplb_counts[l][self._eplb_slot_to_logical[l]]
            rank_load += sl.reshape(R, per_rank).sum(axis=1)
        return float(rank_load.max() / total)

    # ---- SWAP-mode preemption backend (scheduler.swapper) ----------------------

    def swap_out(self, req) -> bool:
        """Copy a victim's computed FULL blocks to host memory, then free its
        device blocks (vLLM V1 SWAP preemption, BLOG_PART3_V2.md:1589-1625).

        Partial-block tokens truncate (recomputed as catch-up on resume).
        Returns False when nothing is swappable — the scheduler falls back
        to recompute.  Reading the cache waits for any in-flight step, but
        victims are never placeholder-carrying requests (scheduler inflight
        guard), so their block contents are final."""
        from ..distributed.pd import extract_kv_pages

        bs = self.block_size
        n_full = min(req.num_computed_tokens // bs, len(req.block_ids))
        if n_full == 0:
            return False
        pages = jax.device_get(extract_kv_pages(self, req.block_ids[:n_full]))
        self.kv_mgr.free(req)
        req.preempt_swapped(pages, n_full * bs)
        return True

    def swap_in(self, req) -> bool:
        """Re-inject a swapped victim's pages into fresh device blocks at
        re-admission; one H2D page copy replaces an O(context) re-prefill.
        Returns False (state untouched) when the pool can't fit them yet."""
        from ..distributed.pd import inject_kv_pages

        n_blocks = req.num_swapped_tokens // self.block_size
        if self.kv_mgr.pool.get_num_free_blocks() < n_blocks:
            return False
        ids = self.kv_mgr.pool.get_new_blocks(n_blocks)
        inject_kv_pages(self, ids, req.swapped_pages)
        req.block_ids = list(ids)
        req.num_computed_tokens = req.num_swapped_tokens
        req.num_cached_blocks = 0
        req.swapped_pages = None
        req.num_swapped_tokens = 0
        return True

    # ---- checkpointing --------------------------------------------------------

    def save(self, path: str) -> None:
        """Persist params + full engine config (utils/checkpoint.py)."""
        from ..utils.checkpoint import save_checkpoint

        save_checkpoint(path, self.params, self.config)

    @classmethod
    def from_checkpoint(cls, path: str, **overrides) -> "LLMEngine":
        """Rebuild an engine from a saved checkpoint.  ``overrides`` replace
        EngineConfig fields (e.g. a different ParallelConfig for restore onto
        a new mesh — shardings are re-applied by the constructor)."""
        import json
        import os

        from ..utils.checkpoint import config_from_dict, load_checkpoint

        cfg_path = os.path.join(path, "config.json")
        if not os.path.exists(cfg_path):
            raise FileNotFoundError(f"{path}/config.json not found")
        with open(cfg_path) as f:
            config = config_from_dict(json.load(f))
        # The stored param tree's structure (expert_map present or not) is
        # decided by the config the checkpoint was SAVED with — overrides
        # (e.g. turning EPLB on for the restored engine) must not change the
        # restore target, only the rebuilt engine.  __init__ adds a fresh
        # identity expert_map when EPLB is enabled and the leaf is missing.
        saved_eplb = config.parallel.eplb_interval > 0
        if overrides:
            config = config.replace(**overrides)

        # Structured restore: orbax needs a target tree to bring back custom
        # nodes (QuantizedLinear[4]) instead of raw dicts/lists.
        def build():
            p = transformer.init_params(jax.random.PRNGKey(0), config.model)
            if config.quant.weight_quant in ("int8", "int4"):
                p = transformer.quantize_params(
                    p, config.model,
                    bits=4 if config.quant.weight_quant == "int4" else 8,
                    scope=config.quant.scope,
                )
            if saved_eplb and config.model.is_moe:
                layers = dict(p["layers"])
                layers["moe"] = {
                    **layers["moe"],
                    "expert_map": jnp.tile(
                        jnp.arange(config.model.num_experts, dtype=jnp.int32),
                        (config.model.num_layers, 1),
                    ),
                }
                p = {**p, "layers": layers}
            return p

        target = jax.eval_shape(build)
        params, _ = load_checkpoint(path, target=target)
        return cls(config, params=params)

    # ---- request API ---------------------------------------------------------

    def add_request(
        self,
        prompt_token_ids: Sequence[int],
        sampling: Optional[SamplingParams] = None,
        priority: int = 0,
    ) -> int:
        assert len(prompt_token_ids) > 0, "empty prompt"
        sp = sampling or SamplingParams()
        assert (
            len(prompt_token_ids) + sp.max_new_tokens <= self.config.model.max_position
        ), "prompt + max_new_tokens exceeds max_position"
        req_id = self._next_req_id
        self._next_req_id += 1
        req = Request(
            req_id=req_id,
            prompt_token_ids=list(prompt_token_ids),
            sampling=sampling or SamplingParams(),
            priority=priority,
            arrival_time=time.monotonic(),
        )
        self._arrival[req_id] = req.arrival_time
        self.scheduler.add_request(req)
        return req_id

    def abort_request(self, req_id: int) -> bool:
        self._arrival.pop(req_id, None)  # aborted pre-first-token: no TTFT
        # Sync the in-flight async steps first: their device writes may
        # target this request's blocks, and with no successor step nothing
        # else would flush the deferred frees.
        self._commit_all_pending()
        return self.scheduler.abort_request(req_id)

    def _note_first_token(self, req_id: int, now: float) -> None:
        """Record TTFT exactly once per request; popping the arrival entry
        doubles as the already-recorded marker, keeping state bounded."""
        arr = self._arrival.pop(req_id, None)
        if arr is not None:
            self._ttfts.append(now - arr)

    @property
    def has_unfinished(self) -> bool:
        return self.scheduler.has_unfinished

    # ---- batch staging ---------------------------------------------------------

    def _next_seed(self) -> int:
        self._step_seed += 1
        return self._step_seed

    def _get_sstate(self, group: List[ScheduledRequest], B_pad: int,
                    pad_between=None):
        """Device-resident SamplingState, re-staged only when the batch
        composition or sampling params change (saves 3 small H2D transfers
        per step — ~10 ms each over the axon tunnel).

        ``pad_between=(n_first, first_pad)``: the mixed prefill+decode step
        places the first ``n_first`` requests at rows 0.. and the rest at
        rows ``first_pad``.. (the logits concat is bucket-aligned)."""
        # Key on the per-row VALUES, not request identity: chunked prefill
        # rotates the scheduled group every step, and re-staging a
        # same-valued state per step put a ~10 ms H2D on the tunnel's
        # prefill critical path (r3 prefill trace: 22 ms/step device idle).
        key = (B_pad, pad_between, tuple(
            (it.request.sampling.temperature,
             it.request.sampling.top_p, it.request.sampling.top_k)
            for it in group
        ))
        if key != self._sstate_key:
            if pad_between is None:
                state = make_sampling_state(
                    [it.request for it in group], B_pad)
            else:
                n_first, first_pad = pad_between
                a = make_sampling_state(
                    [it.request for it in group[:n_first]], first_pad)
                b = make_sampling_state(
                    [it.request for it in group[n_first:]], B_pad - first_pad)
                state = type(a)(*(jnp.concatenate([x, y])
                                  for x, y in zip(a, b)))
            self._sstate_dev = (
                jax.device_put(state),
                sampling_mode([it.request.sampling for it in group]),
            )
            self._sstate_key = key
        return self._sstate_dev

    def _pack_group(self, group: List[ScheduledRequest],
                    decode: bool = False):
        """Stage one group's packed int32 buffer (layout: [tokens |
        positions | slots | tables | ctx | q_len | seed] per row).
        Returns (packed [B_pad, 3*T_pad + N_pad + 3], B_pad, T_pad).

        ``decode=True`` PINS the row count and table width to config
        constants (max seqs / max table width): decode cost is weight-
        stream-bound and the paged kernels skip masked rows/pages, so the
        padding is nearly free — while arrival-dependent shapes made every
        serving pattern compile fresh programs (3-7 s stalls dominated
        bench_serving, r3).  Prefill groups stay adaptive in table width
        (the expanded MLA prefill materializes by it) but their TOKEN
        bucket has a floor (_tp_floor): tail chunks (prompt % quantum)
        would otherwise mint one program per tiny pow2 bucket — padding a
        short chunk into the floor bucket costs ~1 ms of masked compute
        vs a multi-second mid-serving compile."""
        B = len(group)
        # Bucket the batch to dp * pow2 so rows shard evenly over "dp".
        dp = self.config.parallel.dp_size
        B_pad = dp * _next_pow2(cdiv(B, dp))
        T = max(it.num_new_tokens for it in group)
        T_pad = _next_pow2(T)
        if T > 1:
            T_pad = max(T_pad, self._tp_floor)
        n_blocks = max(len(it.request.block_ids) for it in group)
        N_pad = min(_next_pow2(max(n_blocks, 1)), self.max_blocks_per_seq)
        if decode:
            B_pad = max(B_pad, self._bd_pin)
            N_pad = self.max_blocks_per_seq

        packed = np.zeros((B_pad, 3 * T_pad + N_pad + 3), np.int32)
        for i, it in enumerate(group):
            req, n, s0 = it.request, it.num_new_tokens, it.start_pos
            all_ids = req.all_token_ids()
            packed[i, :n] = all_ids[s0 : s0 + n]
            packed[i, T_pad:T_pad + n] = np.arange(s0, s0 + n)
            packed[i, 2 * T_pad:2 * T_pad + n] = it.slots
            packed[i, 3 * T_pad:3 * T_pad + len(req.block_ids)] = req.block_ids
            packed[i, 3 * T_pad + N_pad] = s0 + n
            packed[i, 3 * T_pad + N_pad + 1] = n
        packed[:, 3 * T_pad + N_pad + 2] = self._next_seed()
        return packed, B_pad, T_pad

    def _run_mixed(self, prefill: List[ScheduledRequest],
                   decode: List[ScheduledRequest]) -> List[int]:
        """One fused prefill+decode device call (weights stream once);
        returns sampled tokens for prefill + decode, in that order."""
        packed_p, Bp_pad, Tp_pad = self._pack_group(prefill)
        packed_d, Bd_pad, _ = self._pack_group(decode, decode=True)
        sstate, mode = self._get_sstate(prefill + decode, Bp_pad + Bd_pad,
                                        pad_between=(len(prefill), Bp_pad))
        src = np.full((packed_d.shape[0],), -1, np.int32)
        toks, _chain, self.cache, counts = self._step_mixed_fn(
            self.params, self.cache, packed_p, packed_d, self._dummy_prev,
            jnp.asarray(src), sstate, Tp_pad, mode)
        self._eplb_accumulate(counts)
        arr = np.asarray(toks)
        return ([int(t) for t in arr[:len(prefill)]]
                + [int(t) for t in arr[Bp_pad:Bp_pad + len(decode)]])

    def _run_group(self, group: List[ScheduledRequest],
                   decode: bool = False) -> List[int]:
        """Stage one bucketed model call; returns sampled token per item."""
        B = len(group)
        packed, B_pad, T_pad = self._pack_group(group, decode=decode)

        if self.mesh is not None and self.config.parallel.dp_size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            packed = jax.device_put(
                packed, NamedSharding(self.mesh, P("dp", None)))
        sstate, mode = self._get_sstate(group, B_pad)
        out_tokens, self.cache, counts = self._step_fn(
            self.params, self.cache, packed, sstate, T_pad, mode)
        self._eplb_accumulate(counts)
        if self.draft_params is not None:
            # Keep the draft model's KV in lockstep (prefill / fallback path).
            batch = _unpack_batch(np.asarray(packed) if not isinstance(
                packed, np.ndarray) else packed, T_pad)
            self.draft_cache = self._draft_prefill_fn(
                self.draft_params, self.draft_cache, batch
            )
        return [int(t) for t in np.asarray(out_tokens)[:B]]

    def _decode_macro_k(self, scheduled: List[ScheduledRequest],
                        tokens_ahead: int = 0, pos_offset: int = 0) -> int:
        """Macro length for a pure-decode batch: FULL decode_steps whenever
        any row still needs that many tokens.

        r3 capped K by the MIN remaining tokens across rows, so every
        generation ended in a cascade of shrinking macros (64, 32, 16, ...,
        1) — and each macro pays the full dispatch + result-fetch round
        trip, which dominates on a high-latency tunnel (r4 measured: B=64
        device step 8.4 ms vs engine 27.9 ms/step — 70% overhead, mostly
        the tail cascade).  Rows that pass max_new_tokens inside a pinned
        macro simply have their surplus tokens discarded on the host
        (scheduler.update already skips finished requests), wasting at most
        one macro's tail of device compute per generation instead of paying
        ~log2(K) extra round trips.  K is still bucketed to a power of two
        (bounded program count) and clamped so no position can run past the
        rope table / max_position."""
        need = max(
            it.request.sampling.max_new_tokens
            - len(it.request.output_token_ids) - tokens_ahead
            for it in scheduled
        )
        if need < 1:
            return 0
        K = min(
            self.config.scheduler.decode_steps,
            _next_pow2(need),
            self.config.model.max_position
            - max(it.start_pos + pos_offset for it in scheduled),
        )
        return _pow2_down(K) if K >= 1 else 0

    def _try_multi_step(self, scheduled: List[ScheduledRequest]) -> bool:
        """Dispatch K decode iterations as one device call (async pipeline).

        Only for pure-decode batches.  On success the macro-step is IN
        FLIGHT (self._pending_macro set) and the caller pumps it; False
        falls back to the 1-step path.  Every request must be able to
        pre-allocate K slots (grants roll back on failure so the fallback
        doesn't over-commit)."""
        if (self.config.scheduler.decode_steps <= 1
                or any(it.num_new_tokens != 1 for it in scheduled)):
            return False
        K = self._decode_macro_k(scheduled)
        if K <= 1:
            return False
        granted = []
        for it in scheduled:
            extra = self.kv_mgr.allocate_slots(it.request, K)
            if extra is None:
                for req, ids in granted:
                    self.kv_mgr.rollback(req, ids)
                return False
            granted.append((it.request, extra))

        self._pending_macro = self._dispatch_macro(scheduled, K, tok_dev=None)
        return True

    def _dispatch_macro(self, scheduled, K: int, tok_dev, start_offset: int = 0,
                        dead_rows: frozenset = frozenset()):
        """Stage + dispatch one K-iteration decode macro (no host sync).

        ``tok_dev``: device [B_pad] current tokens (None => upload from host
        state); ``start_offset``: extra tokens beyond each item's start_pos
        already covered by in-flight macros (continuation dispatch).
        ``dead_rows``: row indices whose request finished (or provably will
        inside the pending macro) — packed as pad rows (null tables/slots)
        so a continuation CHAIN survives individual rows finishing; their
        sampled tokens are discarded by scheduler.update."""
        B = len(scheduled)
        dp = self.config.parallel.dp_size
        # Pinned decode shapes (see _pack_group(decode=True)): arrival-
        # independent programs, masked rows/pages are ~free.
        B_pad = self._bd_pin
        N_pad = self.max_blocks_per_seq

        # One packed transfer: [pos0 | tables | slots_k | seed].
        packed = np.zeros((B_pad, 1 + N_pad + K + 1), np.int32)
        tok0 = np.zeros((B_pad,), np.int32)
        for i, it in enumerate(scheduled):
            if i in dead_rows:
                continue  # pad-row conventions: pos 0, null block, slot 0
            req, s0 = it.request, it.start_pos + start_offset
            if tok_dev is None:
                tok0[i] = req.all_token_ids()[s0]
            packed[i, 0] = s0
            packed[i, 1 : 1 + len(req.block_ids)] = req.block_ids
            packed[i, 1 + N_pad : 1 + N_pad + K] = self.kv_mgr.slot_mapping(
                req, s0, K)
        packed[:, 1 + N_pad + K] = self._next_seed()

        if self.mesh is not None and dp > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            packed = jax.device_put(
                packed, NamedSharding(self.mesh, P("dp", None)))
            if tok_dev is None:
                tok_dev = jax.device_put(tok0, NamedSharding(self.mesh, P("dp")))
        elif tok_dev is None:
            tok_dev = jnp.asarray(tok0)

        sstate, mode = self._get_sstate(scheduled, B_pad)
        # Frees are deferred while this macro may still write cache slots.
        self.kv_mgr.begin_deferred_frees()
        toks, self.cache, counts = self._decode_scan_fn(
            self.params, self.cache, tok_dev, packed, sstate, K, mode
        )
        return {"scheduled": scheduled, "K": K, "B": B, "toks": toks,
                "counts": counts, "offset": start_offset}

    def _dispatch_continuation(self, p) -> Optional[dict]:
        """Dispatch the NEXT macro before syncing the pending one: tok0 is
        the pending macro's on-device last sample, so the device pipeline
        never drains while the host processes results (async scheduling)."""
        scheduled, K = p["scheduled"], p["K"]
        if self.scheduler.waiting:  # serve arrivals between macros
            return None
        done_after = p["offset"] + K

        # Chains SURVIVE rows finishing (r5, the B=64 host-gap fix): a row
        # that finished (EOS/abort at an earlier pump) or arithmetically
        # will finish inside the pending macro (max_new reached within its
        # K unsynced tokens) is carried as a masked pad row — breaking the
        # chain instead costs a full unoverlapped exec+RTT+reschedule per
        # finish cohort, which dominated the B=64 wall (staggered chunked-
        # prefill admissions stagger the finishes).
        def _row_done(it):
            r = it.request
            return (r.is_finished
                    or r.sampling.max_new_tokens
                    - len(r.output_token_ids) - K <= 0)

        live = [it for it in scheduled if not _row_done(it)]
        if not live:
            return None
        # Pinned macro length (see _decode_macro_k): continue while ANY live
        # row still needs tokens after the pending macro lands (output
        # lengths don't yet include p's K unsynced tokens); rows that finish
        # mid-macro have their surplus discarded at update().
        K2 = self._decode_macro_k(live, tokens_ahead=K,
                                  pos_offset=done_after)
        if K2 <= 1:
            return None
        granted = []
        for it in live:
            # num_computed still sits at start_pos + p["offset"] (p's updates
            # haven't run), so K (pending) + K2 (new) tokens need slots.
            extra = self.kv_mgr.allocate_slots(it.request, K + K2)
            if extra is None:
                for req, ids in granted:
                    self.kv_mgr.rollback(req, ids)
                return None
            granted.append((it.request, extra))
        dead = frozenset(i for i, it in enumerate(scheduled) if _row_done(it))
        return self._dispatch_macro(scheduled, K2, tok_dev=p["toks"][-1],
                                    start_offset=done_after, dead_rows=dead)

    def _pump_async(self) -> List[Tuple[int, int]]:
        """Dispatch the continuation, then sync + apply the pending macro."""
        p = self._pending_macro
        self._pending_macro = None
        t0 = time.perf_counter()
        cont = self._dispatch_continuation(p)
        t1 = time.perf_counter()

        arr = np.asarray(p["toks"])   # [K, B_pad] — waits for p only
        t2 = time.perf_counter()
        self._eplb_accumulate(p["counts"])
        emitted: List[Tuple[int, int]] = []
        for k in range(p["K"]):
            emitted.extend(self.scheduler.update(
                p["scheduled"], [int(t) for t in arr[k, : p["B"]]]))
        if self._macro_log is not None:
            self._macro_log.append(
                {"K": p["K"], "B": p["B"], "cont_ms": (t1 - t0) * 1e3,
                 "fetch_ms": (t2 - t1) * 1e3,
                 "update_ms": (time.perf_counter() - t2) * 1e3,
                 "had_cont": cont is not None})
        if cont is not None:
            self._pending_macro = cont
        else:
            self.kv_mgr.flush_deferred_frees()

        # Drain: if every request of an in-flight continuation finished in
        # THIS macro (EOS/max_new), its output is dead — wait for its writes
        # (they target deferred blocks) and release.
        if self._pending_macro is not None and all(
            it.request.is_finished for it in self._pending_macro["scheduled"]
        ):
            dead = self._pending_macro
            self._pending_macro = None
            jax.block_until_ready(dead["toks"])
            self.kv_mgr.flush_deferred_frees()

        now = time.monotonic()
        self.metrics["num_steps"] += p["K"]
        self.metrics["num_generated_tokens"] += len(emitted)
        for rid, _ in emitted:
            self._note_first_token(rid, now)
        return emitted

    # ---- async scheduling (prefill/mixed dispatch-before-sync) -----------------

    def _dispatch_async(self, prefill: List[ScheduledRequest],
                        decode: List[ScheduledRequest],
                        prev: Optional[dict]) -> dict:
        """Dispatch one prefill/mixed step WITHOUT syncing it (vLLM V1
        async scheduling; VERDICT r2 #3's TTFT path).  The scheduler state
        advances with placeholder tokens (scheduler.update_async_dispatch);
        decode rows whose current token is the previous step's placeholder
        read it on-device from ``prev``'s output.  Returns the pending
        record for ``_commit_oldest``."""
        from .scheduler import PLACEHOLDER

        group = prefill + decode
        self.kv_mgr.begin_deferred_frees()
        if decode:
            packed_p, Bp_pad, Tp_pad = self._pack_group(prefill)
            packed_d, Bd_pad, _ = self._pack_group(decode, decode=True)
            src = np.full((Bd_pad,), -1, np.int32)
            for j, it in enumerate(decode):
                if it.request.all_token_ids()[it.start_pos] == PLACEHOLDER:
                    row = prev["rowof"][it.request.req_id]  # must exist
                    src[j] = row
            prev_toks = prev["chain"] if prev is not None else self._dummy_prev
            sstate, mode = self._get_sstate(group, Bp_pad + Bd_pad,
                                            pad_between=(len(prefill), Bp_pad))
            toks, chain, self.cache, counts = self._step_mixed_fn(
                self.params, self.cache, packed_p, packed_d, prev_toks,
                jnp.asarray(src), sstate, Tp_pad, mode)
            rows = (list(range(len(prefill)))
                    + [Bp_pad + j for j in range(len(decode))])
            # Chain indices follow the FIXED layout (_make_chain): prefill
            # rows at i, decode rows at _bd_pin + j.
            chain_rows = (list(range(len(prefill)))
                          + [self._bd_pin + j for j in range(len(decode))])
        else:
            packed, B_pad, T_pad = self._pack_group(prefill)
            sstate, mode = self._get_sstate(prefill, B_pad)
            toks, self.cache, counts = self._step_fn(
                self.params, self.cache, packed, sstate, T_pad, mode)
            chain = self._chain_pad_fn(toks)
            rows = list(range(len(prefill)))
            chain_rows = rows

        records = self.scheduler.update_async_dispatch(group)
        self.metrics["num_steps"] += 1
        self.metrics["num_prefill_tokens"] += sum(
            it.num_new_tokens for it in prefill)
        return {
            "toks": toks, "chain": chain, "rows": rows, "records": records,
            "counts": counts,
            "rowof": {group[i].request.req_id: chain_rows[i]
                      for i in range(len(group))},
        }

    def warmup(self, prompt_lens: Sequence[int] = (512,),
               modes: Sequence[str] = ("greedy",)) -> int:
        """Precompile the serving program set (vLLM-TPU-style compilation
        warmup).  With decode shapes pinned (_pack_group(decode=True)) the
        set is bounded and arrival-independent, but each program still
        compiles on first use — under live Poisson traffic those compiles
        (3-13 s each over a remote-compile link) land mid-serving and
        dominate tail latency (measured: 21 compile stalls = 105 s of a
        112 s bench_serving window, r3).  Call once at server start.

        Executes each program ONCE on all-pad dummy rows (pads write the
        null block and read zero context — the engine's standing pad
        convention), so the real jit call cache is populated.  Returns the
        number of programs executed."""
        scfg = self.config.scheduler
        budget = scfg.max_num_batched_tokens
        Bd, Nd = self._bd_pin, self.max_blocks_per_seq
        count = 0

        def sstate_for(B):
            return jax.device_put(make_sampling_state([], B))

        dummy_src = jnp.full((Bd,), -1, jnp.int32)

        ks = sorted({_pow2_down(k) for k in range(2, scfg.decode_steps + 1)}) \
            if scfg.decode_steps > 1 else []
        mixed_ks = sorted({_pow2_down(k)
                           for k in range(2, scfg.mixed_steps + 1)}) \
            if scfg.mixed_steps > 1 else []

        for mode in modes:
            sst_d = sstate_for(Bd)
            # Pure-decode: single step + every macro length (+continuation
            # reuses the same programs).
            packed1 = np.zeros((Bd, 3 * 1 + Nd + 3), np.int32)
            toks, self.cache, _ = self._step_fn(
                self.params, self.cache, packed1, sst_d, 1, mode)
            count += 1
            for K in ks:
                packedk = np.zeros((Bd, 1 + Nd + K + 1), np.int32)
                tok0 = jnp.zeros((Bd,), jnp.int32)
                _, self.cache, _ = self._decode_scan_fn(
                    self.params, self.cache, tok0, packedk, sst_d, K, mode)
                count += 1

            for plen in prompt_lens:
                Tp = max(_next_pow2(min(plen, budget)), self._tp_floor)
                n_p = _next_pow2(max(1, cdiv(plen, self.block_size)))
                bp_max = max(1, min(_next_pow2(scfg.max_num_seqs),
                                    budget // Tp))
                n_ps = {min(n_p, Nd), min(2 * n_p, Nd)}
                bp = 1
                while bp <= bp_max:
                    for Np in sorted(n_ps):
                        packed_p = np.zeros((bp, 3 * Tp + Np + 3), np.int32)
                        toks_p, self.cache, _ = self._step_fn(
                            self.params, self.cache, packed_p,
                            sstate_for(bp), Tp, mode)
                        self._chain_pad_fn(toks_p)
                        count += 1
                        if not self._mixed_ok:
                            continue
                        packed_d1 = np.zeros((Bd, 3 * 1 + Nd + 3), np.int32)
                        sst_m = sstate_for(bp + Bd)
                        _, _, self.cache, _ = self._step_mixed_fn(
                            self.params, self.cache, packed_p, packed_d1,
                            self._dummy_prev, dummy_src, sst_m, Tp, mode)
                        count += 1
                        for K in mixed_ks:
                            packed_dk = np.zeros((Bd, 1 + Nd + K + 2),
                                                 np.int32)
                            _, _, self.cache, _ = self._mixed_macro_fn(
                                self.params, self.cache, packed_p, packed_dk,
                                self._dummy_prev, dummy_src, sst_m, Tp, K,
                                mode)
                            count += 1
                    bp *= 2
        return count

    def _mixed_macro_k(self, decode: List[ScheduledRequest]) -> int:
        """Decode iterations to fuse behind this mixed step.

        Adaptive: every fused iteration delays the NEXT prefill chunk by
        one decode step (~5 ms), so K scales with the decode-row share —
        a cold burst (prefill backlog >> decode rows) keeps K near 1 to
        protect TTFT, while steady serving (decode rows dominate) runs
        the full mixed_steps to amortize the per-step result-fetch RTT.
        K is bucketed to powers of two so at most log2(mixed_steps) macro
        programs ever compile; capped so no row overruns max_new_tokens
        (output length already counts in-flight placeholders)."""
        if not decode:
            return 0
        scfg = self.config.scheduler
        K_max = scfg.mixed_steps
        backlog = len(self.scheduler.waiting) + sum(
            1 for r in self.scheduler.running if r.is_prefill)
        # Warm-burst guard: while more prefill TOKENS wait than one step's
        # budget retires, every fused decode iteration is pure overhead —
        # it streams the full weights (~4.4 ms at the midsize shape) to
        # advance only the decode rows, delays every queued prefill's TTFT,
        # and desynchronizes row depths for the post-burst decode macros.
        # K=1 rides the prefill chunk's weight stream for free (one fused
        # forward).  (Cold bursts don't even reach here — the scheduler's
        # prefill-priority hold keeps their decode rows unscheduled; this
        # covers bursts arriving mid-serving.)
        pending_tokens = sum(
            r.num_tokens - r.num_computed_tokens
            for r in self.scheduler.running
            if r.is_prefill or r.needs_catchup) + sum(
            r.num_tokens - r.num_computed_tokens
            for r in self.scheduler.waiting)
        if pending_tokens > scfg.max_num_batched_tokens:
            return 1
        share = len(decode) / max(1, len(decode) + backlog)
        K = min(K_max, int(K_max * share + 0.5))
        # Cold-burst TAIL: the scheduler's hold just released (backlog now
        # fits one step) but rows are still depth-synchronized at <= 1
        # output token.  Jumping straight to the share-formula K here fused
        # K=8 decode iterations behind the burst's LAST prefill chunks
        # (measured +35 ms on the final first-token at B=16) and
        # re-staggered the rows the hold kept aligned.  Cap K at 2 until
        # the batch has actually entered steady decode.
        if all(len(it.request.output_token_ids) <= 1 for it in decode):
            K = min(K, 2)
        K = min(K, min(
            it.request.sampling.max_new_tokens
            - len(it.request.output_token_ids)
            for it in decode
        ))
        return _pow2_down(K) if K >= 1 else 0

    def _dispatch_async_macro(self, prefill: List[ScheduledRequest],
                              decode: List[ScheduledRequest],
                              prev: Optional[dict],
                              K: int) -> Optional[dict]:
        """Dispatch one fused prefill + K-step decode macro without syncing
        it.  Returns None (and rolls back slot grants) when the pool can't
        cover K tokens per decode row — caller falls back to the plain
        1-step mixed dispatch."""
        from .scheduler import PLACEHOLDER

        granted = []
        for it in decode:
            extra = self.kv_mgr.allocate_slots(it.request, K)
            if extra is None:
                for req, ids in granted:
                    self.kv_mgr.rollback(req, ids)
                return None
            granted.append((it.request, extra))

        self.kv_mgr.begin_deferred_frees()
        packed_p, Bp_pad, Tp_pad = self._pack_group(prefill)
        Bd = len(decode)
        Bd_pad = self._bd_pin  # pinned decode shapes (_pack_group docstring)
        N_pad = self.max_blocks_per_seq
        packed_d = np.zeros((Bd_pad, 1 + N_pad + K + 2), np.int32)
        src = np.full((Bd_pad,), -1, np.int32)
        for j, it in enumerate(decode):
            req, s0 = it.request, it.start_pos
            packed_d[j, 0] = s0
            packed_d[j, 1:1 + len(req.block_ids)] = req.block_ids
            packed_d[j, 1 + N_pad:1 + N_pad + K] = self.kv_mgr.slot_mapping(
                req, s0, K)
            cur = req.all_token_ids()[s0]
            if cur == PLACEHOLDER:
                src[j] = prev["rowof"][req.req_id]  # must exist (step())
            else:
                packed_d[j, 1 + N_pad + K] = cur
        packed_d[:, 1 + N_pad + K + 1] = self._next_seed()

        group = prefill + decode
        sstate, mode = self._get_sstate(group, Bp_pad + Bd_pad,
                                        pad_between=(len(prefill), Bp_pad))
        prev_toks = prev["chain"] if prev is not None else self._dummy_prev
        toks, chain, self.cache, counts = self._mixed_macro_fn(
            self.params, self.cache, packed_p, packed_d, prev_toks,
            jnp.asarray(src), sstate, Tp_pad, K, mode)
        B0 = Bp_pad + Bd_pad
        rows = (list(range(len(prefill)))
                + [Bp_pad + j for j in range(Bd)]
                + [B0 + (k - 1) * Bd_pad + j
                   for k in range(1, K) for j in range(Bd)])
        records = self.scheduler.update_async_dispatch_macro(group, decode, K)
        self.metrics["num_steps"] += 1
        self.metrics["num_prefill_tokens"] += sum(
            it.num_new_tokens for it in prefill)
        # Chain indices follow the FIXED layout (_make_chain): prefill
        # rows at i, decode rows at _bd_pin + j.
        rowof = {}
        for i in range(len(prefill)):
            rowof[prefill[i].request.req_id] = i
        for j in range(Bd):
            rowof[decode[j].request.req_id] = self._bd_pin + j
        return {"toks": toks, "chain": chain, "rows": rows,
                "records": records, "counts": counts, "rowof": rowof}

    def _commit_oldest(self) -> List[Tuple[int, int]]:
        """Sync the OLDEST pending async step and apply its real tokens.
        Commits run strictly FIFO so placeholder patches land in order.
        Deferred block frees flush only once NO step is in flight (a
        pending step's device writes may still target freed-request
        blocks)."""
        p = self._pending_q.popleft()
        arr = np.asarray(p["toks"])  # host sync for THIS step only
        self._eplb_accumulate(p["counts"])
        emitted = self.scheduler.update_async_commit(
            p["records"], [int(arr[r]) for r in p["rows"]])
        if not self._pending_q and self._pending_macro is None:
            self.kv_mgr.flush_deferred_frees()
        now = time.monotonic()
        self.metrics["num_generated_tokens"] += len(emitted)
        for rid, _ in emitted:
            self._note_first_token(rid, now)
        return emitted

    def _commit_all_pending(self) -> List[Tuple[int, int]]:
        emitted: List[Tuple[int, int]] = []
        while self._pending_q:
            emitted += self._commit_oldest()
        return emitted

    def _try_spec_step(self, scheduled: List[ScheduledRequest]) -> Optional[List[Tuple[int, int]]]:
        """Speculative decode for a pure-decode batch: draft K, verify once,
        accept a prefix.  Returns emitted (req_id, token) or None to fall back.
        """
        if self.config.spec is None or any(it.num_new_tokens != 1 for it in scheduled):
            return None
        K = self.config.spec.num_draft_tokens

        drafts = None
        if self.config.spec.method == "ngram":
            # Host-side prompt lookup; fall back to plain decode when no
            # request has a matching suffix.
            props = [
                propose_ngram(it.request.all_token_ids()[: it.start_pos + 1],
                              self.config.spec.ngram_n, K)
                for it in scheduled
            ]
            if all(p is None for p in props):
                return None
            drafts = [p if p is not None else [0] * K for p in props]

        granted = []
        for it in scheduled:
            extra = self.kv_mgr.allocate_slots(it.request, K + 1)
            if extra is None:
                for req, ids in granted:
                    self.kv_mgr.rollback(req, ids)
                return None
            granted.append((it.request, extra))

        B = len(scheduled)
        dp = self.config.parallel.dp_size
        B_pad = dp * _next_pow2(cdiv(B, dp))
        n_blocks = max(len(it.request.block_ids) for it in scheduled)
        N_pad = min(_next_pow2(max(n_blocks, 1)), self.max_blocks_per_seq)

        tok0 = np.zeros((B_pad,), np.int32)
        pos0 = np.zeros((B_pad,), np.int32)
        tables = np.zeros((B_pad, N_pad), np.int32)
        slots_k = np.zeros((B_pad, K + 1), np.int32)
        for i, it in enumerate(scheduled):
            req, s0 = it.request, it.start_pos
            tok0[i] = req.all_token_ids()[s0]
            pos0[i] = s0
            tables[i, : len(req.block_ids)] = req.block_ids
            slots_k[i] = self.kv_mgr.slot_mapping(req, s0, K + 1)

        # Device-resident sampling state, re-staged only on batch change —
        # same cache the plain decode path uses (_get_sstate); rebuilding it
        # every spec step cost ~10 ms/step of tunnel latency.
        sstate, _mode = self._get_sstate(scheduled, B_pad)
        self._rng, skey = jax.random.split(self._rng)
        if drafts is not None:
            d = np.zeros((B_pad, K), np.int32)
            d[:B] = np.asarray(drafts, np.int32)
            out, n_acc, self.cache = self._ngram_verify_fn(
                self.params, self.cache, tok0, pos0, tables, slots_k, d,
                sstate, skey,
            )
        elif self._spec_step_fn is not None:
            out, n_acc, self.cache, self.draft_cache = self._spec_step_fn(
                self.params, self.draft_params, self.cache, self.draft_cache,
                tok0, pos0, tables, slots_k, sstate, skey,
            )
        else:
            # pp: replicated draft scan, then the pipelined verify.
            drafts_d, dprobs_d, self.draft_cache = self._draft_scan_fn(
                self.draft_params, self.draft_cache, tok0, pos0, tables,
                slots_k, sstate, skey,
            )
            out, n_acc, self.cache = self._spec_verify_fn(
                self.params, self.cache, tok0, pos0, tables, slots_k,
                drafts_d, dprobs_d, sstate, skey,
            )
        out = np.asarray(out)      # [B_pad, K+1]
        n_acc = np.asarray(n_acc)  # [B_pad]

        self.metrics["spec_drafted"] = self.metrics.get("spec_drafted", 0) + B * K
        self.metrics["spec_accepted"] = self.metrics.get("spec_accepted", 0) + int(
            n_acc[:B].sum()
        )

        emitted: List[Tuple[int, int]] = []
        for k in range(K + 1):
            items_k = [it for i, it in enumerate(scheduled) if k <= n_acc[i]]
            toks_k = [int(out[i, k]) for i, it in enumerate(scheduled) if k <= n_acc[i]]
            if not items_k:
                break
            emitted.extend(self.scheduler.update(items_k, toks_k))
        return emitted

    # ---- the engine step ----------------------------------------------------------

    def step(self) -> List[Tuple[int, int]]:
        """One scheduling + forward + sample + update cycle.

        Returns [(req_id, new_token)] emitted this step (mini_vllm.py:712-764).
        """
        # Async decode pipeline: a macro-step is in flight — dispatch its
        # continuation, then sync + apply it.
        if self._pending_macro is not None:
            return self._pump_async()

        t_step0 = time.perf_counter()
        scheduled = self.scheduler.schedule()
        if not scheduled:
            if self._pending_q:
                return self._commit_oldest()
            return []

        if self._eplb_on:
            self._eplb_steps += 1
            if self._eplb_steps % self.config.parallel.eplb_interval == 0:
                self._eplb_rebalance()

        prefill_items = [it for it in scheduled if it.num_new_tokens > 1]
        decode_items = [it for it in scheduled if it.num_new_tokens == 1]

        # Async scheduling: while prefill work exists, dispatch THIS step
        # against the provisional (placeholder) state and only then sync
        # the OLDEST in-flight step — with async_depth >= 2 the pipeline
        # hides both host scheduling AND the result-fetch RTT (the decode
        # analogue is _pump_async).
        if self._async_ok and prefill_items:
            from .scheduler import PLACEHOLDER

            t_sched = time.perf_counter()
            emitted: List[Tuple[int, int]] = []
            # A decode row's placeholder must come from the LATEST pending
            # step (its on-device output feeds this dispatch).  A request
            # that skipped a step (budget/preemption churn) can carry an
            # older one: commit forward until every placeholder is either
            # patched or owned by ``prev``.  Rare — FCFS grants running
            # decodes every step.
            def _stale(it):
                toks = it.request.all_token_ids()
                if it.num_new_tokens == 1:
                    return (toks[it.start_pos] == PLACEHOLDER
                            and (not self._pending_q or it.request.req_id
                                 not in self._pending_q[-1]["rowof"]))
                # Prefill / catch-up rows pack host token VALUES: any
                # placeholder inside the packed range must be committed
                # first or -1s would be written into KV as real ids
                # (ADVICE r4 medium; the scheduler's inflight self-preempt
                # guard makes this unreachable — kept as defense in depth).
                lo, hi = it.start_pos, it.start_pos + it.num_new_tokens
                return any(t == PLACEHOLDER for t in toks[lo:hi])

            while self._pending_q and any(
                    _stale(it) for it in prefill_items + decode_items):
                emitted += self._commit_oldest()
            prev = self._pending_q[-1] if self._pending_q else None
            if emitted:
                # Commits may finish requests (EOS at patch time).
                prefill_items = [it for it in prefill_items
                                 if not it.request.is_finished]
                decode_items = [it for it in decode_items
                                if not it.request.is_finished]
            if prefill_items:
                t_disp = time.perf_counter()
                pend = None
                K = self._mixed_macro_k(decode_items)
                if K >= 2:
                    pend = self._dispatch_async_macro(
                        prefill_items, decode_items, prev, K)
                if pend is None:
                    pend = self._dispatch_async(prefill_items, decode_items,
                                                prev)
                self._pending_q.append(pend)
                t_commit = time.perf_counter()
                while len(self._pending_q) > self._async_depth:
                    emitted += self._commit_oldest()
                if self._macro_log is not None:
                    self._macro_log.append({
                        "kind": "async", "Bp": len(prefill_items),
                        "Bd": len(decode_items), "K": K,
                        "sched_ms": (t_sched - t_step0) * 1e3,
                        "stale_ms": (t_disp - t_sched) * 1e3,
                        "dispatch_ms": (t_commit - t_disp) * 1e3,
                        "commit_ms": (time.perf_counter() - t_commit) * 1e3,
                    })
            elif decode_items:
                # EOS commits drained the prefill group: fall through to
                # the plain decode paths next step; just report.
                pass
            return emitted

        # Paths below need real token values: sync any pending steps first.
        emitted_prev: List[Tuple[int, int]] = []
        if self._pending_q:
            emitted_prev = self._commit_all_pending()
            # Commit may finish scheduled requests (EOS) — drop their items.
            scheduled = [it for it in scheduled if not it.request.is_finished]
            prefill_items = [it for it in scheduled if it.num_new_tokens > 1]
            decode_items = [it for it in scheduled if it.num_new_tokens == 1]
            if not scheduled:
                return emitted_prev

        spec_emitted = self._try_spec_step(scheduled)
        if spec_emitted is not None:
            emitted = spec_emitted
            self.metrics["num_steps"] += 1
            self.metrics["num_generated_tokens"] += len(emitted)
            now = time.monotonic()
            for rid, _ in emitted:
                self._note_first_token(rid, now)
            return emitted_prev + emitted

        if self._try_multi_step(scheduled):
            if emitted_prev:
                # Tokens committed above (e.g. the burst ramp's last prefill
                # chunks) must not wait a whole macro fetch to reach the
                # caller: the macro is already in flight — return now and
                # let the next step() pump it.  Measured: the last cohort's
                # first tokens were riding ~150 ms (B=16) / ~290 ms (B=64)
                # behind the first decode macro at every ramp->decode
                # transition.
                return emitted_prev
            return self._pump_async()

        prefill = prefill_items
        decode = decode_items

        sampled: Dict[int, int] = {}
        if prefill and decode and self._mixed_ok:
            # ONE fused call: decode rows don't pay a second weight stream
            # while prefill chunks run (VERDICT r2 #3 mixed ragged step).
            toks = self._run_mixed(prefill, decode)
            for it, tok in zip(prefill + decode, toks):
                sampled[id(it)] = tok
        else:
            for group, is_dec in ((prefill, False), (decode, True)):
                if group:
                    toks = self._run_group(group, decode=is_dec)
                    for it, tok in zip(group, toks):
                        sampled[id(it)] = tok

        emitted = self.scheduler.update(scheduled, [sampled[id(it)] for it in scheduled])

        now = time.monotonic()
        self.metrics["num_steps"] += 1
        self.metrics["num_generated_tokens"] += len(emitted)
        self.metrics["num_prefill_tokens"] += sum(
            it.num_new_tokens for it in scheduled if it.num_new_tokens > 1
        )
        for rid, _ in emitted:
            self._note_first_token(rid, now)
        return emitted_prev + emitted

    # ---- convenience front end -------------------------------------------------------

    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        sampling: Optional[SamplingParams] = None,
        max_steps: int = 100_000,
    ) -> Dict[int, List[int]]:
        """Submit prompts, run the loop to completion (mini_vllm.py:766-783)."""
        ids = [self.add_request(p, sampling) for p in prompts]
        outputs: Dict[int, List[int]] = {rid: [] for rid in ids}
        steps = 0
        while self.scheduler.has_unfinished and steps < max_steps:
            for rid, tok in self.step():
                if rid in outputs:
                    outputs[rid].append(tok)
            steps += 1
        return outputs

    # ---- observability ------------------------------------------------------------------

    def ttft_seconds(self) -> List[float]:
        """TTFTs of the most recent requests (bounded window)."""
        return list(self._ttfts)

    def stats(self) -> Dict[str, float]:
        return {
            **self.metrics,
            "kv_usage": self.kv_mgr.usage,
            "prefix_hit_rate": self.kv_mgr.hit_rate,
            "num_preempted": self.scheduler.stats.num_preempted,
            "num_swapped_out": self.scheduler.stats.num_swapped_out,
            "num_swapped_in": self.scheduler.stats.num_swapped_in,
        }
