"""Serving scale-out: N engine replicas behind the DP Router.

bench_serving.py measures ONE engine's admission ceiling (~8 req/s inside
the 260 ms TTFT SLO at the midsize shape, benchmarks/RESULTS.md r3); this
bench composes ``distributed.router.Router`` with the same open-loop
Poisson arrival harness to demonstrate the system scales PAST one engine
(VERDICT r3 #6; the DP row of SURVEY §2c; ref: "M decode nodes serve M
conversations", BLOG_PART3.md:860).

Each replica is a PDWorker (engine + connector + shared metadata server +
page store) stepped by its own thread — a per-worker lock serializes
``add_request`` against ``step`` (the same imperative-shell/functional-core
boundary the engine itself draws).  The router places each arrival by
prefix affinity then least-load.

On CPU this is the scale-out MECHANISM demonstration (tiny model, virtual
devices share the host cores, so the 2-worker speedup is real concurrency
in the host shell + XLA threadpool); on one real TPU chip two replicas
would timeshare the same chip, so the TPU anchor remains the 1-engine
bench_serving table.

Run: python benchmarks/bench_router.py [n_workers ...]   (CPU ok)
Env: VFS_ROUTER_SECS (default 20), VFS_ROUTER_RATE (req/s, default 12).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SECS = float(os.environ.get("VFS_ROUTER_SECS", "20"))
RATE = float(os.environ.get("VFS_ROUTER_RATE", "12"))
PROMPT, SHARED, NEW_TOKENS = 96, 32, 16


def _tiny_engine(seed: int = 0):
    from vllm_from_scratch_tpu.core.config import (
        CacheConfig, EngineConfig, ModelConfig, SchedulerConfig)
    from vllm_from_scratch_tpu.core.engine import LLMEngine
    from vllm_from_scratch_tpu.utils.compile_cache import (
        enable_persistent_cache)

    # Replica engines build IDENTICAL programs; the persistent cache makes
    # the second..Nth replica's compiles disk hits instead of concurrent
    # cold compiles (which otherwise dominate the 2-worker window).
    enable_persistent_cache()

    return LLMEngine(EngineConfig(
        model=ModelConfig(
            vocab_size=512, hidden_size=128, num_layers=2,
            num_heads=4, num_kv_heads=4, max_position=512,
            intermediate_size=128,
            kv_lora_rank=32, qk_rope_head_dim=16, qk_nope_head_dim=32,
            v_head_dim=32, num_experts=4, top_k=2, num_shared_experts=1,
            dtype="float32",
        ),
        cache=CacheConfig(block_size=16, num_blocks=256, kv_quant="none"),
        scheduler=SchedulerConfig(max_num_seqs=8,
                                  max_num_batched_tokens=256,
                                  decode_steps=8, chunk_quantum=0,
                                  async_scheduling=False),
    ))


def build_cluster(n_workers: int):
    """n PDWorkers sharing one metadata server + page store + Router."""
    from vllm_from_scratch_tpu.distributed.connector import KVConnector
    from vllm_from_scratch_tpu.distributed.metadata import GlobalMetadataServer
    from vllm_from_scratch_tpu.distributed.pd import PageStore, PDWorker
    from vllm_from_scratch_tpu.distributed.router import Router
    from vllm_from_scratch_tpu.distributed.transfer import TransferEngine

    meta = GlobalMetadataServer()
    store = PageStore()
    workers = []
    for node in range(n_workers):
        eng = _tiny_engine(seed=node)
        conn = KVConnector(node, meta, TransferEngine(node), eng.block_size)
        workers.append(PDWorker(eng, conn, store))
    return Router(workers, meta), workers


def run_router(rate: float, n_workers: int, secs: float = SECS,
               verbose: bool = True) -> dict:
    """Open-loop Poisson serving across n replicas; returns percentiles."""
    from vllm_from_scratch_tpu.core.config import SamplingParams

    router, workers = build_cluster(n_workers)
    rng = np.random.RandomState(0)
    sp = SamplingParams(max_new_tokens=NEW_TOKENS, temperature=0.0,
                        ignore_eos=True)
    prefix = list(rng.randint(1, 511, SHARED))

    def prompt():
        return prefix + list(rng.randint(1, 511, PROMPT - SHARED))

    # Warm every replica's program set (identical configs share nothing
    # across engines in-process, but CPU compiles are cached on disk).
    for w in workers:
        w.engine.generate([prompt() for _ in range(2)], sp)

    n_total = max(4, int(rate * secs))
    arrivals = np.cumsum(rng.exponential(1.0 / rate, n_total))

    locks = {id(w): threading.Lock() for w in workers}
    stop = threading.Event()
    ttft_lock = threading.Lock()
    submitted: dict = {}          # (node, rid) -> arrival time
    ttft: list = []
    done_count = [0]

    t0 = time.perf_counter()

    def serve(w):
        node = w.connector.node_id
        while not stop.is_set():
            with locks[id(w)]:
                busy = w.engine.has_unfinished
                emitted = w.engine.step() if busy else []
            now = time.perf_counter() - t0
            firsts = []
            for rid, _tok in emitted:
                key = (node, rid)
                arr = submitted.pop(key, None)
                if arr is not None:
                    firsts.append(now - arr)
            if firsts:
                with ttft_lock:
                    ttft.extend(firsts)
            with ttft_lock:
                done_count[0] += sum(
                    1 for rid in {r for r, _ in emitted}
                    if rid not in w.engine.scheduler.requests)
            if not busy:
                time.sleep(0.001)

    threads = [threading.Thread(target=serve, args=(w,), daemon=True)
               for w in workers]
    for t in threads:
        t.start()

    per_worker = {w.connector.node_id: 0 for w in workers}
    nxt = 0
    deadline = t0 + secs + 60.0
    while done_count[0] < n_total and time.perf_counter() < deadline:
        now = time.perf_counter() - t0
        if nxt < n_total and arrivals[nxt] <= now:
            w = router.pick(prompt())
            p = prompt()
            with locks[id(w)]:
                rid = w.engine.add_request(p, sp)
            submitted[(w.connector.node_id, rid)] = arrivals[nxt]
            per_worker[w.connector.node_id] += 1
            nxt += 1
        else:
            time.sleep(0.001)
    stop.set()
    for t in threads:
        t.join(timeout=5)
    wall = time.perf_counter() - t0

    def pct(xs, p):
        return float(np.percentile(np.asarray(xs), p)) if xs else float("nan")

    out = {
        "n_workers": n_workers,
        "rate_req_s": rate,
        "n_requests": n_total,
        "completed": int(done_count[0]),
        "p50_ttft_ms": round(1e3 * pct(ttft, 50), 1),
        "p99_ttft_ms": round(1e3 * pct(ttft, 99), 1),
        "per_worker_requests": per_worker,
        "affinity_hits": router.stats["affinity_hits"],
        "balanced": router.stats["balanced"],
        "wall_s": round(wall, 1),
    }
    if verbose:
        print(json.dumps(out), flush=True)
    return out


def main():
    ns = [int(n) for n in sys.argv[1:]] or [1, 2]
    rows = [run_router(RATE, n) for n in ns]
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_router.json"), "w") as f:
        json.dump(rows, f, indent=1)
    if len(rows) >= 2:
        r1, r2 = rows[0], rows[1]
        print(f"scale-out: {r1['n_workers']} worker p50 TTFT "
              f"{r1['p50_ttft_ms']} ms -> {r2['n_workers']} workers "
              f"{r2['p50_ttft_ms']} ms at {RATE} req/s")


if __name__ == "__main__":
    main()
