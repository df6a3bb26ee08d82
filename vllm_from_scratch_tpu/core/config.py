"""Configuration tree for the TPU serving engine.

One dataclass per subsystem, mirroring the names the reference exposes as
constructor kwargs / module constants (ref: 05_mini_vllm/mini_vllm.py:649-662,
01_paged_attention/paged_attention.py:12, BLOG_PART2_V2.md:1147-1198
SchedulerConfig discussion) so that a reference user finds the same knobs.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class ModelConfig:
    """Shapes of the served model (ref: mini_vllm.py:649-662)."""

    vocab_size: int = 1000
    hidden_size: int = 256
    num_layers: int = 4
    num_heads: int = 4
    num_kv_heads: int = 4
    intermediate_size: Optional[int] = None  # default 4 * hidden
    max_position: int = 4096
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    dtype: str = "float32"  # compute dtype: "float32" on CPU tests, "bfloat16" on TPU
    # MoE (0 experts = dense FFN).  ref: 03_moe/mini_moe.py:182-236
    num_experts: int = 0
    top_k: int = 2
    num_groups: int = 1          # >1 => DeepSeek grouped routing
    topk_group: int = 1
    num_shared_experts: int = 0
    aux_loss_coeff: float = 0.01
    # MLA (kv_lora_rank > 0 enables latent attention).  ref: 04_mla/mini_mla.py:139-201
    kv_lora_rank: int = 0
    qk_rope_head_dim: int = 0
    qk_nope_head_dim: int = 0  # 0 => head_dim
    q_lora_rank: int = 0       # 0 => num_heads * qk_head_dim // 4 (mini_mla.py:174-177)
    v_head_dim: int = 0        # 0 => head_dim

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def ffn_dim(self) -> int:
        return self.intermediate_size or 4 * self.hidden_size

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    @property
    def is_mla(self) -> bool:
        return self.kv_lora_rank > 0


@dataclass(frozen=True)
class CacheConfig:
    """Paged KV cache geometry + quantization (ref: paged_attention.py:12-51)."""

    block_size: int = 16
    num_blocks: int = 256
    # "int8" => quantized KV pages with per-slot fp32 scales; "none" => dtype pages.
    kv_quant: str = "int8"
    enable_prefix_caching: bool = True

    @property
    def kv_dtype_bytes(self) -> int:
        return 1 if self.kv_quant == "int8" else 4


@dataclass(frozen=True)
class SchedulerConfig:
    """Continuous-batching caps (ref: mini_vllm.py:164-190; BLOG_PART2_V2.md:1147-1198)."""

    max_num_seqs: int = 8
    max_num_batched_tokens: int = 512
    enable_chunked_prefill: bool = True
    # Multi-step decode (vLLM's num-scheduler-steps): pure-decode batches run
    # up to this many autoregressive iterations inside ONE jitted lax.scan,
    # syncing tokens to the host once per macro-step.  Hides host scheduling
    # and device->host latency behind device compute; post-EOS tokens inside
    # a macro-step are discarded on the host.
    decode_steps: int = 1
    # Async scheduling (vLLM V1 --async-scheduling): prefill/mixed steps are
    # dispatched one ahead of their host sync — step N+1 is scheduled and
    # dispatched against placeholder tokens before step N's results are
    # fetched, hiding host scheduling + dispatch latency during the
    # TTFT-critical prefill phase (the decode analogue is decode_steps > 1).
    # Emission is delayed by async_depth steps; outputs are unchanged.
    # Auto-disabled when it cannot compose (pp / dp / cp meshes,
    # speculative decoding).  Depth 2 hides the result-fetch round trip on
    # top of host scheduling (fetch RTT can exceed a chunk's compute, so a
    # depth-1 pipeline is fetch-bound — benchmarks/RESULTS.md r3).
    async_scheduling: bool = True
    async_depth: int = 2
    # Decode iterations fused behind each async mixed prefill step (the
    # mixed analogue of decode_steps): under continuous serving a plain
    # mixed step gives decode rows ONE token per prefill chunk and pays a
    # result-fetch round trip per token; K iterations amortize both.
    # 1 = plain mixed steps.
    mixed_steps: int = 8
    # Chunked-prefill quantum: when a prompt is SPLIT (chunk < remaining),
    # the chunk is rounded down to a multiple of this, so budget
    # fragmentation (decode rows nibbling the token budget) can't mint
    # near-arbitrary chunk sizes — each a distinct compiled program on
    # TPU (static shapes).  The engine pads sub-quantum final chunks up
    # into the quantum token bucket (_pack_group _tp_floor).  Only active
    # when the budget covers >= 2 quanta; 0 disables.
    chunk_quantum: int = 512
    # Preemption policy when blocks run out (blog scheduler BLOG_PART2.md:992-1015).
    enable_preemption: bool = True
    # What happens to a victim's computed KV (vLLM V1 RECOMPUTE vs SWAP,
    # BLOG_PART3_V2.md:1589-1625): "recompute" drops it and re-prefills on
    # resume; "swap" copies full blocks to host memory and re-injects them
    # at re-admission — for long-context victims this replaces an O(context)
    # re-prefill with one H2D page copy.
    preemption_mode: str = "recompute"
    policy: str = "fcfs"  # or "priority"
    long_prefill_token_threshold: int = 0  # 0 = disabled
    max_num_partial_prefills: int = 0      # 0 = unlimited


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh axes.  All default to 1 (single chip)."""

    dp_size: int = 1
    tp_size: int = 1
    ep_size: int = 1
    pp_size: int = 1  # reserved: pool keys carry pp_rank from day 1 (BLOG_PART2B_V2.md:1259)
    sp_size: int = 1
    # Context parallelism for MLA long context (BLOG_PART3_V2.md:709-768;
    # parallel/cp_serving.py): the latent cache's slots shard over a "cp"
    # mesh axis with virtual blocks of block_size*cp tokens — KV bytes and
    # attention FLOPs per chip both divide by cp, for prefill (PCP) and
    # decode (DCP) alike.
    cp_size: int = 1
    # Expert-parallel dispatch: "psum" = replicated activations + psum (low
    # latency, small batches); "a2a" = token-sharded all_to_all dispatch
    # (bandwidth-optimal, the NCCL All2All pattern, BLOG_PART3_V2.md:262-287).
    ep_dispatch: str = "psum"
    # MLA latent-cache layout under TP: "replicated" (no comm, r bytes/token
    # per chip) or "tpla" (TPLA-style: latent rank sharded over "tp", KV
    # memory / chip divided by tp at the cost of two psums per layer —
    # PAPERS.md "TPLA: Tensor Parallel Latent Attention").
    mla_kv: str = "replicated"
    # CP attention form (parallel/cp_serving.py):
    # - "merge" (default): each rank attends its local 1/cp of the context
    #   and partials flash-merge with one pmax + two psums over ICI — the
    #   optimal decode form (traffic = one accumulator, independent of S).
    # - "ring": paged ring attention (the reference's npu_ring_mla,
    #   BLOG_PART3_V2.md:676-681) for prefill/catch-up chunks — queries
    #   split T/cp per rank and the INT8 page-slices rotate around the ICI
    #   ring via ppermute, so per-round score blocks are cp x smaller
    #   (activation working set for very long chunks) and the KV bytes on
    #   the wire are INT8, not f32 accumulators.  Decode steps (T=1 cannot
    #   sequence-shard) keep the merge form.
    cp_attn: str = "merge"
    # EPLB (BLOG_PART3_V2.md:185-187; parallel/eplb.py): every
    # ``eplb_interval`` engine steps, re-pack experts onto ranks by measured
    # router load and permute the weight stacks between steps.  0 = off.
    eplb_interval: int = 0
    # Ranks to balance over; 0 => tp_size (the EP axis).
    eplb_ranks: int = 0

    @property
    def world_size(self) -> int:
        return self.dp_size * self.tp_size * self.pp_size * self.cp_size


@dataclass(frozen=True)
class SpecConfig:
    """Speculative decoding (blog components: BLOG_PART2.md:1121-1330,
    BLOG_PART2_V2.md:983-1056).  method="draft_model": a small draft model
    proposes num_draft_tokens per step; method="ngram": draft-free
    prompt-lookup — the K tokens that followed the last occurrence of the
    current ngram_n-token suffix are proposed (one-hot draft distribution).
    Either way the target verifies in one forward and the distribution-exact
    rejection sampler keeps a prefix."""

    draft: Optional["ModelConfig"] = None  # required for method="draft_model"
    num_draft_tokens: int = 4
    method: str = "draft_model"  # or "ngram"
    ngram_n: int = 2             # suffix length matched for prompt lookup


@dataclass(frozen=True)
class QuantConfig:
    """Weight quantization: "none" | "int8" | "int4" (weight-only,
    per-output-channel scales; int4 packs two nibbles per byte).

    ``scope``: "all" quantizes every large matmul weight; "experts"
    quantizes only the routed-expert stacks (where the fused Pallas kernel
    applies scales in-epilogue and int8 halves the dominant HBM stream) and
    keeps dense projections / lm_head in the compute dtype — measured
    faster on v5e, where the int8->bf16 upconvert of small weights runs on
    the VPU at ~150-430 G elem/s and costs more than the bytes it saves."""

    weight_quant: str = "none"
    scope: str = "all"


@dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling knobs (ref: mini_vllm.py:127-131)."""

    max_new_tokens: int = 16
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0  # 0 = disabled
    # Token id that terminates generation (ref uses 0: mini_vllm.py:327).
    eos_token_id: int = 0
    ignore_eos: bool = False


@dataclass(frozen=True)
class EngineConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    quant: QuantConfig = field(default_factory=QuantConfig)
    spec: Optional[SpecConfig] = None
    seed: int = 0

    def replace(self, **kw) -> "EngineConfig":
        return dataclasses.replace(self, **kw)
