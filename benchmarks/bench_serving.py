"""Continuous-serving benchmark: Poisson arrivals, TTFT/ITL percentiles.

The burst benches (bench_midsize, sweep_batch) measure the engine's
ceilings; production serving is a STREAM — requests arrive while others
decode, so chunked prefill, the mixed prefill+decode step, prefix caching,
and preemption all sit on the latency path.  This bench drives the midsize
engine with open-loop Poisson arrivals at a configurable request rate and
reports the percentile latencies a serving SLO is written against
(vLLM's benchmark_serving.py is the reference genre).

Arrivals are pre-drawn from a seeded exponential process and admitted by
wall clock; every request = 512-token prompt (32-token shared prefix) +
128 decode tokens, greedy.

Run: python benchmarks/bench_serving.py [rate_req_s ...]  (TPU)
Env: VFS_BENCH_SERVING_SECS (default 60), VFS_BENCH_BATCH (engine size).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SECS = float(os.environ.get("VFS_BENCH_SERVING_SECS", "60"))
# VFS_SERVING_STEPLOG=path: dump one line per engine.step() —
# (t_end, dt, n_running, n_prefill, n_waiting, n_emitted) — for
# diagnosing where serving wall time goes.
STEPLOG = [] if os.environ.get("VFS_SERVING_STEPLOG") else None
NEW_TOKENS = 128
PROMPT = 512
SHARED = 32


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p)) if len(xs) else float("nan")


def build_warm_engine(verbose: bool = True):
    """One warmed engine serves every rate window (r5): building + warming
    a fresh engine per rate cost ~11 min EACH on the tunnel (the axon
    backend cannot serialize executables, so the persistent compile cache
    is a no-op there — utils/compile_cache.py), and sequential engines in
    one process leave prior weights resident (the bench.py leg-isolation
    lesson).  Windows are isolated by draining between rates and reporting
    per-window counter deltas."""
    from benchmarks.bench_midsize import BATCH, build_engine

    from vllm_from_scratch_tpu.core.config import SamplingParams
    from vllm_from_scratch_tpu.utils.compile_cache import (
        enable_persistent_cache)

    enable_persistent_cache()  # no-op on axon; real backends restart warm

    eng = build_engine(BATCH)
    rng = np.random.RandomState(0)
    sp = SamplingParams(max_new_tokens=NEW_TOKENS, temperature=0.0,
                        ignore_eos=True)
    prefix = list(rng.randint(1, 31999, SHARED))

    def prompt():
        return prefix + list(rng.randint(1, 31999, PROMPT - SHARED))

    # Compilation warmup: precompile the full serving program set (decode
    # macros, mixed macros, prefill buckets).  Without this, first-use
    # compiles (3-13 s each) land mid-serving and dominate the window.
    t0 = time.perf_counter()
    n_prog = eng.warmup(prompt_lens=(PROMPT,))
    eng.generate([prompt() for _ in range(min(4, BATCH))], sp)
    if verbose:
        print(f"warmup: {n_prog} programs in "
              f"{time.perf_counter()-t0:.0f} s", flush=True)
    return eng, sp, prompt


def run_rate(rate: float, eng=None, sp=None, prompt=None,
             verbose: bool = True) -> dict:
    if eng is None:
        eng, sp, prompt = build_warm_engine(verbose)
    rng = np.random.RandomState(int(rate * 16) + 1)
    preempt0 = eng.scheduler.stats.num_preempted
    hit0, query0 = eng.kv_mgr.hit_blocks, eng.kv_mgr.query_blocks

    n_total = max(4, int(rate * SECS))
    gaps = rng.exponential(1.0 / rate, n_total)
    arrivals = np.cumsum(gaps)

    t0 = time.perf_counter()
    submitted = {}      # rid -> (arrival_wall, prev_emit_time)
    ttft, itls, finished = [], [], 0
    nxt = 0
    while finished < n_total:
        now = time.perf_counter() - t0
        while nxt < n_total and arrivals[nxt] <= now:
            rid = eng.add_request(prompt(), sp)
            submitted[rid] = [arrivals[nxt], None]
            nxt += 1
        if not eng.has_unfinished:
            if nxt >= n_total:
                break
            time.sleep(min(0.002, arrivals[nxt] - now))
            continue
        ts = time.perf_counter()
        emitted = eng.step()
        now = time.perf_counter() - t0
        if STEPLOG is not None:
            npf = sum(1 for r in eng.scheduler.running if r.is_prefill)
            STEPLOG.append((round(now, 4), round(now - (ts - t0), 4),
                            len(eng.scheduler.running), npf,
                            len(eng.scheduler.waiting), len(emitted)))
        # Macro decode emits K tokens per request at once; charge the gap
        # per TOKEN so ITL percentiles reflect the per-token cadence a
        # streaming client sees, not the macro boundary.
        per_rid = {}
        for rid, _tok in emitted:
            per_rid[rid] = per_rid.get(rid, 0) + 1
        for rid, k in per_rid.items():
            rec = submitted.get(rid)
            if rec is None:
                continue
            if rec[1] is None:
                # First emission (may carry a whole macro): TTFT event.
                ttft.append(now - rec[0])
            else:
                itls.extend([(now - rec[1]) / k] * k)
            rec[1] = now
        finished = sum(
            1 for rid in submitted
            if rid not in eng.scheduler.requests
        )
    wall = time.perf_counter() - t0
    out = {
        "rate_req_s": rate,
        "n_requests": n_total,
        "throughput_tok_s": round(n_total * NEW_TOKENS / wall, 1),
        "p50_ttft_ms": round(1e3 * pct(ttft, 50), 1),
        "p99_ttft_ms": round(1e3 * pct(ttft, 99), 1),
        "p50_itl_ms": round(1e3 * pct(itls, 50), 2),
        "p99_itl_ms": round(1e3 * pct(itls, 99), 2),
        "preemptions": eng.scheduler.stats.num_preempted - preempt0,
        "prefix_hit_rate": round(
            (eng.kv_mgr.hit_blocks - hit0)
            / max(eng.kv_mgr.query_blocks - query0, 1), 3),
        "wall_s": round(wall, 1),
    }
    if STEPLOG is not None:
        with open(os.environ["VFS_SERVING_STEPLOG"], "w") as f:
            for row in STEPLOG:
                f.write(json.dumps(row) + "\n")
        STEPLOG.clear()
    if verbose:
        print(json.dumps(out), flush=True)
    return out


def main():
    rates = [float(r) for r in sys.argv[1:]] or [2.0, 4.0, 8.0]
    eng, sp, prompt = build_warm_engine()
    rows = []
    for r in rates:
        rows.append(run_rate(r, eng, sp, prompt))
        while eng.has_unfinished:  # drain between windows
            eng.step()
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_serving.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
