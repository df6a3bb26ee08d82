"""Engine-side prefill anatomy (VERDICT r4 #2 companion to probe_prefill).

probe_prefill measures the DEVICE cost of one 2048-token chunk forward
(r5: 21.8 ms = 36% MFU); the engine's measured prefill rate (~26k tok/s =
77 ms/chunk-step) captures only ~28% of that.  This probe walls each
engine.step() during a pure prefill burst and dumps the async-path phase
breakdown (VFS_MACRO_TRACE): schedule / stale-commits / dispatch / commit,
so the missing ~55 ms/step is attributed, not guessed.

Run: python benchmarks/probe_prefill_engine.py          (TPU)
Env: B (default 16), NT (new tokens, default 8), DEPTH (async_depth).
"""

import os
import sys
import time

os.environ["VFS_MACRO_TRACE"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("B", "16"))
NT = int(os.environ.get("NT", "8"))
if os.environ.get("DEPTH"):
    os.environ["VFS_BENCH_ASYNC_DEPTH"] = os.environ["DEPTH"]


def main():
    from bench_midsize import build_engine

    from vllm_from_scratch_tpu.core.config import SamplingParams

    eng = build_engine(B)
    rng = np.random.RandomState(0)
    sp = SamplingParams(max_new_tokens=NT, temperature=0.0, ignore_eos=True)
    t0 = time.perf_counter()
    eng.generate([list(rng.randint(1, 31999, 512)) for _ in range(B)], sp)
    print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)

    eng._macro_log.clear()
    prompts = [list(rng.randint(1, 31999, 512)) for _ in range(B)]
    ids = [eng.add_request(p, sp) for p in prompts]
    t0 = time.perf_counter()
    first = {}
    steps = []
    last_wall = None
    while eng.has_unfinished:
        s0 = time.perf_counter()
        emitted = eng.step()
        s1 = time.perf_counter()
        n_before = len(first)
        for rid, _ in emitted:
            first.setdefault(rid, s1 - t0)
        if len(first) < len(ids):
            steps.append((s1 - s0, len(emitted)))
        elif n_before < len(ids):
            last_wall = s1 - s0  # the step that closed the window
    window = max(first.values())
    toks = B * 512
    print(f"\nprefill window: {1e3*window:.0f} ms for {toks} tokens = "
          f"{toks/window/1e3:.1f}k tok/s "
          f"({len(steps)} steps before last first-token)")
    print(f"{'kind':>6} {'Bp':>3} {'Bd':>3} {'K':>3} {'sched':>7} "
          f"{'stale':>7} {'disp':>7} {'commit':>7}")
    for m in eng._macro_log:
        if m.get("kind") == "async":
            print(f"{'async':>6} {m['Bp']:>3} {m['Bd']:>3} {m['K']:>3} "
                  f"{m['sched_ms']:>7.1f} {m['stale_ms']:>7.1f} "
                  f"{m['dispatch_ms']:>7.1f} {m['commit_ms']:>7.1f}")
        else:
            print(f"{'pump':>6} {'':>3} {m.get('B',''):>3} "
                  f"{m.get('K',''):>3} {'':>7} {'':>7} "
                  f"{m.get('cont_ms',0):>7.1f} {m.get('fetch_ms',0):>7.1f}")
    print(f"\nper-step wall (ms): "
          + " ".join(f"{1e3*s:.0f}" for s, _ in steps)
          + (f"  | window-closing step: {1e3*last_wall:.0f}"
             if last_wall is not None else ""))


if __name__ == "__main__":
    main()
