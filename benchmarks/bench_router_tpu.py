"""Router scale-out anchored on the REAL chip (VERDICT r4 #6).

bench_router.py demonstrates the routing MECHANISM with CPU fakes/threads;
this bench runs N real midsize serving engines in SEPARATE OS PROCESSES
(each owns its own device client on the one v5e chip — the chip time-shares
their program queues) behind the prefix-affinity/least-load Router policy,
and measures the admission-rate claim the DP row makes (ref: "M decode
nodes serve M conversations", BLOG_PART3.md:860):

    at an arrival rate where ONE engine saturates on admission
    (max_num_seqs / chunk budget), TWO engines hold the TTFT SLO.

The claim is about ADMISSION scaling, not FLOPs: bench_serving measured the
single B=16 engine queueing at 16 req/s (p50 TTFT 2.2 s) while the chip
itself still had ~4x decode headroom — two replicas double the concurrent
token slots and split the arrival stream, so TTFT stays at the service
floor until the CHIP saturates.

Parent process: Poisson arrivals -> least-outstanding worker (the Router's
load policy; prefix affinity is moot here because every replica shares the
prompt prefix distribution).  Child process: one LLMEngine + RPC server
(distributed/net.py) + a stepping thread; TTFT measured inside the child
from RPC receipt to first emitted token.

Run: python benchmarks/bench_router_tpu.py            (TPU; ~15-25 min)
Env: VFS_RT_RATE (req/s, default 16), VFS_RT_SECS (default 45),
     VFS_RT_WORKERS (comma list, default "1,2").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RATE = float(os.environ.get("VFS_RT_RATE", "16"))
SECS = float(os.environ.get("VFS_RT_SECS", "45"))
WORKERS = [int(w) for w in os.environ.get("VFS_RT_WORKERS", "1,2").split(",")]
NEW_TOKENS = 128
PROMPT = 512
SHARED = 32


class EngineWorker:
    """RPC surface of one serving replica (child process)."""

    def __init__(self):
        from benchmarks.bench_midsize import BATCH, build_engine
        from vllm_from_scratch_tpu.core.config import SamplingParams

        self.eng = build_engine(BATCH)
        self.sp = SamplingParams(max_new_tokens=NEW_TOKENS, temperature=0.0,
                                 ignore_eos=True)
        self.lock = threading.Lock()
        self.t_sub = {}      # rid -> submit wall time
        self.ttft = []       # seconds
        self.done = 0
        self._stop = False
        self._stepper = threading.Thread(target=self._run, daemon=True)

    def warm(self) -> int:
        rng = np.random.RandomState(0)
        prefix = list(rng.randint(1, 31999, SHARED))
        n = self.eng.warmup(prompt_lens=(PROMPT,))
        self.eng.generate(
            [prefix + list(rng.randint(1, 31999, PROMPT - SHARED))
             for _ in range(4)], self.sp)
        self._stepper.start()
        return n

    def submit(self, prompt_token_ids) -> int:
        with self.lock:
            rid = self.eng.add_request(list(prompt_token_ids), self.sp)
            self.t_sub[rid] = time.perf_counter()
        return rid

    def load(self) -> int:
        return len(self.t_sub) - self.done

    def stats(self) -> dict:
        return {"ttft": list(self.ttft), "done": self.done,
                "submitted": len(self.t_sub)}

    def shutdown(self) -> bool:
        self._stop = True
        return True

    def _run(self):
        while not self._stop:
            with self.lock:
                busy = self.eng.has_unfinished
                if busy:
                    emitted = self.eng.step()
                    now = time.perf_counter()
                    for rid, _tok in emitted:
                        t0 = self.t_sub.get(rid)
                        if t0 is not None:
                            self.ttft.append(now - t0)
                            del self.t_sub[rid]
                            self.done += 1
            if not busy:
                time.sleep(0.002)


def worker_main(port: int):
    from vllm_from_scratch_tpu.distributed.net import RPCServer

    w = EngineWorker()
    srv = RPCServer(w, port=port)
    print(f"WORKER_READY {srv.port}", flush=True)
    while not w._stop:
        time.sleep(0.25)
    time.sleep(0.5)


def run_workers(n: int) -> dict:
    from vllm_from_scratch_tpu.distributed.net import RPCProxy

    procs, proxies = [], []
    base = 19400 + 10 * n
    for i in range(n):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(base + i)],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
    try:
        deadline = time.time() + 1800
        for i in range(n):
            while time.time() < deadline:
                try:
                    p = RPCProxy("127.0.0.1", base + i, timeout=60.0)
                    proxies.append(p)
                    break
                except OSError:
                    time.sleep(2.0)
            else:
                raise RuntimeError(f"worker {i} never came up")
        # Warm SEQUENTIALLY: concurrent cold compiles over the tunnel
        # contend; the second worker's identical HLO hits the compile
        # server's cache and warms much faster.
        for i, p in enumerate(proxies):
            t0 = time.time()
            nprog = RPCProxy("127.0.0.1", base + i, timeout=1800.0).warm()
            print(f"worker {i}: {nprog} programs warm in "
                  f"{time.time()-t0:.0f} s", flush=True)

        rng = np.random.RandomState(0)
        prefix = list(rng.randint(1, 31999, SHARED))

        def prompt():
            return prefix + list(rng.randint(1, 31999, PROMPT - SHARED))

        n_total = max(4, int(RATE * SECS))
        arrivals = np.cumsum(rng.exponential(1.0 / RATE, n_total))
        t0 = time.perf_counter()
        nxt = 0
        while nxt < n_total:
            now = time.perf_counter() - t0
            if arrivals[nxt] > now:
                time.sleep(min(0.005, arrivals[nxt] - now))
                continue
            # Router least-load placement (distributed/router.py policy).
            loads = [p.load() for p in proxies]
            proxies[int(np.argmin(loads))].submit(prompt())
            nxt += 1
        # Drain.
        while True:
            stats = [p.stats() for p in proxies]
            if sum(s["done"] for s in stats) >= n_total:
                break
            time.sleep(1.0)
        wall = time.perf_counter() - t0
        ttft = sorted(t for s in stats for t in s["ttft"])
        out = {
            "workers": n,
            "rate_req_s": RATE,
            "n_requests": n_total,
            "p50_ttft_ms": round(1e3 * float(np.percentile(ttft, 50)), 1),
            "p99_ttft_ms": round(1e3 * float(np.percentile(ttft, 99)), 1),
            "throughput_tok_s": round(n_total * NEW_TOKENS / wall, 1),
            "wall_s": round(wall, 1),
            "per_worker_done": [s["done"] for s in stats],
        }
        print(json.dumps(out), flush=True)
        return out
    finally:
        for p in proxies:
            try:
                p.shutdown()
                p.close()
            except Exception:
                pass
        for pr in procs:
            try:
                pr.wait(timeout=10)
            except Exception:
                pr.terminate()


def main():
    rows = [run_workers(n) for n in WORKERS]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_router_tpu.json")
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"-> {path}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker_main(int(sys.argv[2]))
    else:
        main()
