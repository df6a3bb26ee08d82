"""Mid-size model benchmark: the engine beyond toy scale.

A DeepSeek-lite shape (1B-class dense compute): hidden 1024, 12 layers,
16 heads, MLA r=256, 16 experts top-2 + shared, vocab 32k, INT8 weights +
INT8 latent KV, bf16 activations.  B=16 requests, 512-token prompts,
128 new tokens, full-scan decode.

Run: python benchmarks/bench_midsize.py   (TPU; first compile ~2-4 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from vllm_from_scratch_tpu.core.config import (
        CacheConfig, EngineConfig, ModelConfig, QuantConfig, SamplingParams,
        SchedulerConfig,
    )
    from vllm_from_scratch_tpu.core.engine import LLMEngine

    eng = LLMEngine(EngineConfig(
        model=ModelConfig(
            vocab_size=32000, hidden_size=1024, num_layers=12,
            num_heads=16, num_kv_heads=16, max_position=2048,
            intermediate_size=2816,
            kv_lora_rank=256, qk_rope_head_dim=32, qk_nope_head_dim=64,
            v_head_dim=64,
            num_experts=16, top_k=2, num_shared_experts=1,
            dtype="bfloat16",
        ),
        cache=CacheConfig(block_size=16, num_blocks=1024, kv_quant="int8"),
        scheduler=SchedulerConfig(max_num_seqs=16, max_num_batched_tokens=2048,
                                  decode_steps=128),
        quant=QuantConfig(weight_quant="int8"),
    ))
    nbytes = sum(
        x.size * x.dtype.itemsize
        for x in __import__("jax").tree.leaves(eng.params)
        if hasattr(x, "dtype")
    )
    print(f"params: {nbytes/1e6:.0f} MB (int8 weights)")

    rng = np.random.RandomState(0)
    sp = SamplingParams(max_new_tokens=128, temperature=0.0, ignore_eos=True)
    prompts = [list(rng.randint(1, 31999, 512)) for _ in range(16)]
    t0 = time.perf_counter()
    eng.generate([list(p) for p in prompts], sp)  # warm/compile
    print(f"warmup (incl. compile): {time.perf_counter()-t0:.1f} s")

    prompts = [list(rng.randint(1, 31999, 512)) for _ in range(16)]
    t0 = time.perf_counter()
    ids = [eng.add_request(p, sp) for p in prompts]
    first, decode_t0, decode_toks = {}, None, 0
    while eng.has_unfinished:
        emitted = eng.step()
        now = time.perf_counter()
        for rid, _ in emitted:
            first.setdefault(rid, now - t0)
        if emitted and len(first) == len(ids):
            if decode_t0 is None:
                decode_t0 = now
            else:
                decode_toks += len(emitted)
    dt = time.perf_counter() - decode_t0
    ttft = sorted(first.values())
    print(f"decode: {decode_toks/dt:.0f} tok/s   "
          f"p50 TTFT: {1000*ttft[len(ttft)//2]:.0f} ms   "
          f"total wall: {time.perf_counter()-t0:.1f} s")


if __name__ == "__main__":
    main()
