"""vllm-from-scratch-tpu: a TPU-native (JAX/XLA/Pallas/pjit) quantized LLM serving engine.

A from-scratch re-design of every subsystem taught by the reference mini-vLLM
(HeduAiDev/vllm-from-scratch), built TPU-first:

- Paged KV cache as sharded ``jax.Array`` INT8 pages with per-slot scales,
  written by a Pallas scatter kernel and read by a Pallas paged-attention
  kernel with fused dequantization.
- A continuous-batching scheduler with chunked prefill, prefix caching
  (chained SHA-256 block hashes + LRU eviction) and preemption-by-recompute.
- A single jitted step function per (batch, seq) bucket — the TPU analogue of
  CUDA graphs — fed only dense int32 tables from the Python-side scheduler.
- MoE (TopK / DeepSeek GroupedTopK routing, shared experts, expert parallelism
  via shard_map all_to_all) and MLA (latent KV cache, decoupled RoPE) model
  families.
- Speculative decoding with a distribution-exact vectorized rejection sampler.
- A Mooncake-style global KV pool: metadata server, async transfer engine
  (simulated DCN for tests), PD-disaggregated clusters.

Subpackages
-----------
- ``core``        engine, scheduler, request state, block pool, KV cache
- ``ops``         Pallas kernels + pure-JAX reference ops (attention, quant, sampling)
- ``models``      transformer / MoE / MLA model definitions (functional, pytree params)
- ``parallel``    device mesh, shardings, collectives
- ``distributed`` global prefix cache, KV transfer engine, PD disaggregation
- ``utils``       metrics, counters, misc
"""

__version__ = "0.1.0"

# Public API (lazy: keep `import vllm_from_scratch_tpu` free of jax init).
__all__ = [
    "LLMEngine",
    "EngineConfig", "ModelConfig", "CacheConfig", "SchedulerConfig",
    "ParallelConfig", "QuantConfig", "SpecConfig", "SamplingParams",
]


def __getattr__(name):
    if name == "LLMEngine":
        from .core.engine import LLMEngine

        return LLMEngine
    if name in __all__:
        from .core import config as _c

        return getattr(_c, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
