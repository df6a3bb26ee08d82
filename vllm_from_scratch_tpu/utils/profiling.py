"""Tracing / profiling / throughput harness.

Equivalent of the reference's ad-hoc perf_counter benchmarks
(ref: 05_mini_vllm/mini_vllm.py:894-974 benchmark_throughput,
03_moe/mini_moe.py:485-511 benchmark_moe, BLOG_PART2_V2.md:1229-1255 TTFT
harness), upgraded to first-class utilities:

- ``StepTimer``       — per-step wall-clock samples with percentile summary.
- ``trace(logdir)``   — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace (XLA ops, DMA, fusion timeline).
- ``benchmark_throughput(engine, ...)`` — drives a full serve loop and
  reports decode tokens/s, total tokens/s, TTFT percentiles, prefix-cache
  hit rate and KV usage — the counters BASELINE.json's north-star metrics
  map onto.  ``bench.py`` is the one-line-JSON wrapper over this.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np


@dataclass
class StepTimer:
    """Collects per-step durations; use as ``with timer.step(): ...``."""

    samples_s: List[float] = field(default_factory=list)

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self.samples_s.append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        if not self.samples_s:
            return {"steps": 0}
        a = np.asarray(self.samples_s)
        return {
            "steps": len(a),
            "mean_ms": float(a.mean() * 1e3),
            "p50_ms": float(np.percentile(a, 50) * 1e3),
            "p90_ms": float(np.percentile(a, 90) * 1e3),
            "p99_ms": float(np.percentile(a, 99) * 1e3),
            "total_s": float(a.sum()),
        }


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Device trace via jax.profiler (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark_throughput(
    engine,
    prompts: Sequence[Sequence[int]],
    sampling,
    *,
    warmup: bool = True,
    trace_dir: Optional[str] = None,
) -> Dict[str, float]:
    """Serve ``prompts`` to completion, measuring the north-star metrics.

    Decode tokens/s is measured from the first step after every request has
    emitted its first token (so prefill cost lands in TTFT, not in decode
    throughput) — the same split the reference's harness makes.
    """
    if warmup:
        # compile every bucket the measured run will hit
        engine.generate([list(p) for p in prompts], sampling)

    timer = StepTimer()
    submit = time.perf_counter()
    ids = [engine.add_request(list(p), sampling) for p in prompts]
    first_token: Dict[int, float] = {}
    decode_t0 = None
    decode_tokens = 0
    total_tokens = 0
    with trace(trace_dir):
        while engine.has_unfinished:
            with timer.step():
                emitted = engine.step()
            now = time.perf_counter()
            total_tokens += len(emitted)
            for rid, _ in emitted:
                first_token.setdefault(rid, now - submit)
            if emitted and len(first_token) == len(ids):
                if decode_t0 is None:
                    decode_t0 = now
                else:
                    decode_tokens += len(emitted)
    total_time = time.perf_counter() - submit
    decode_time = (time.perf_counter() - decode_t0) if decode_t0 else total_time

    ttft = sorted(first_token.values()) or [0.0]
    stats = engine.stats()
    return {
        "decode_tokens_per_s": decode_tokens / decode_time if decode_time > 0 else 0.0,
        "total_tokens_per_s": total_tokens / total_time if total_time > 0 else 0.0,
        "p50_ttft_ms": 1e3 * ttft[len(ttft) // 2],
        "p99_ttft_ms": 1e3 * ttft[min(len(ttft) - 1, int(len(ttft) * 0.99))],
        "prefix_cache_hit_rate": stats.get("prefix_hit_rate", 0.0),
        "kv_usage": stats.get("kv_usage", 0.0),
        "num_preempted": stats.get("num_preempted", 0),
        **{f"step_{k}": v for k, v in timer.summary().items()},
    }
