"""Long-context engine benchmark: Pallas kernels vs XLA path, end to end.

The headline bench (bench.py) runs short toy contexts where the XLA gather
path wins and is auto-selected; this one serves ~2k-token prompts so decode
attention crosses the Pallas dispatch threshold — measuring the kernels'
effect on real serving throughput, not in isolation.

Run: python benchmarks/bench_longctx.py   (TPU; ~2 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_engine():
    from vllm_from_scratch_tpu.core.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig,
    )
    from vllm_from_scratch_tpu.core.engine import LLMEngine

    return LLMEngine(EngineConfig(
        model=ModelConfig(
            vocab_size=1000, hidden_size=512, num_layers=4,
            num_heads=8, num_kv_heads=8, max_position=4096,
            intermediate_size=1024,
            kv_lora_rank=128, qk_rope_head_dim=32, qk_nope_head_dim=64,
            v_head_dim=64, dtype="bfloat16",
        ),
        cache=CacheConfig(block_size=16, num_blocks=2048, kv_quant="int8"),
        scheduler=SchedulerConfig(max_num_seqs=8, max_num_batched_tokens=2048,
                                  decode_steps=32),
    ))


def run(num_requests=8, prompt_len=1920, new_tokens=64):
    from vllm_from_scratch_tpu.core.config import SamplingParams

    eng = build_engine()
    rng = np.random.RandomState(0)
    sp = SamplingParams(max_new_tokens=new_tokens, temperature=0.0,
                        ignore_eos=True)
    prompts = [list(rng.randint(1, 999, prompt_len)) for _ in range(num_requests)]
    eng.generate([list(p) for p in prompts], sp)  # warmup/compile

    prompts = [list(rng.randint(500, 999, prompt_len)) for _ in range(num_requests)]
    t0 = time.perf_counter()
    ids = [eng.add_request(p, sp) for p in prompts]
    first = {}
    decode_t0, decode_toks = None, 0
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
    decode_time = time.perf_counter() - decode_t0
    return decode_toks / decode_time if decode_time > 0 else 0.0


if __name__ == "__main__":
    default = run()
    os.environ["VFS_PALLAS"] = "0"
    xla = run()
    print(f"long-ctx decode tok/s  (B=8, ctx~2k, int8 KV, MLA):")
    print(f"  pallas kernels (default): {default:8.1f}")
    print(f"  XLA gather path (forced): {xla:8.1f}")
    print(f"  speedup: {default / xla:.2f}x")
