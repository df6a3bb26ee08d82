"""Shared builder for the TPU-gated engine e2e test (test_tpu_engine_e2e).

Run as a script it prints the greedy tokens as JSON on the CPU backend;
imported by the gated test it generates on whatever backend is live (the
real TPU under VFS_TPU_REAL_DEVICE=1).  One tiny midsize-flavored config —
MLA latents + fused-MoE experts + INT8 weights + INT8 KV + chunked prefill
+ macro decode scan — so an engine regression on real Mosaic is caught by
token comparison, not just the per-kernel equivalence tests.

Numerics: float32 activations under ``jax.default_matmul_precision
("highest")``.  The r3 session ran this in bf16 and the gate FAILED on a
near-tie argmax flip (request 1 diverged from its first token; all 34
per-kernel equivalence tests were green on Mosaic): with random-init
weights the top-2 logit gap over a 1000-vocab is ~1e-2·σ, the same order
as cross-backend bf16 accumulation noise, and r3's fused projection pairs
changed the accumulation order.  In f32/highest the cross-backend error is
~1e-6 relative, far below any realistic tie, while the regression classes
this gate exists for (wrong slot mapping, stale cache, misindexed layer,
async-chain corruption) remain O(1) logit errors — dtype-independent.
The bf16 Mosaic kernels keep their own on-chip equivalence coverage in
test_pallas_kernels / test_moe.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_and_generate():
    import jax
    import numpy as np

    from vllm_from_scratch_tpu.core.config import (
        CacheConfig, EngineConfig, ModelConfig, QuantConfig, SamplingParams,
        SchedulerConfig,
    )
    from vllm_from_scratch_tpu.core.engine import LLMEngine

    # "highest" pins TPU f32 matmuls to full-precision accumulation (the
    # default truncates operands to bf16 on the MXU, which reintroduces
    # exactly the cross-backend argmax-flip noise this child avoids).
    with jax.default_matmul_precision("highest"):
        eng = LLMEngine(EngineConfig(
            model=ModelConfig(
                vocab_size=1000, hidden_size=256, num_layers=2, num_heads=4,
                num_kv_heads=4, max_position=256, intermediate_size=512,
                kv_lora_rank=64, qk_rope_head_dim=16, qk_nope_head_dim=32,
                v_head_dim=32, num_experts=8, top_k=2, num_shared_experts=1,
                dtype="float32",
            ),
            cache=CacheConfig(block_size=16, num_blocks=64, kv_quant="int8"),
            # budget 32 < prompt 40 forces chunked prefill; decode_steps=8
            # exercises the async macro-scan pipeline.
            scheduler=SchedulerConfig(max_num_seqs=4,
                                      max_num_batched_tokens=32,
                                      decode_steps=8),
            quant=QuantConfig(weight_quant="int8"),
        ))
        rng = np.random.RandomState(7)
        prompts = [list(rng.randint(1, 999, 40)) for _ in range(2)]
        sp = SamplingParams(max_new_tokens=12, temperature=0.0,
                            ignore_eos=True)
        out = eng.generate(prompts, sp)
    return {int(k): [int(t) for t in v] for k, v in out.items()}


if __name__ == "__main__":
    import json

    import jax

    jax.config.update("jax_platforms", "cpu")
    print("E2EJSON " + json.dumps(build_and_generate()), flush=True)
