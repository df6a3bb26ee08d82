"""Per-macro host-overhead breakdown of the decode pipeline (VERDICT r4 #1).

Runs the midsize engine at B= (env, default 64) with VFS_MACRO_TRACE on and
prints, for each decode macro-step, where the wall went:

- cont_ms:   dispatching the continuation macro (pack + slot grants + enqueue)
- fetch_ms:  np.asarray(toks) — waiting for the PENDING macro's result
- update_ms: scheduler bookkeeping over K*B emitted tokens

plus the derived engine ms/step vs the pure-device ms/step measured by
benchmarks/probe_step.py.  The engine/device ratio at B=64 is the r4 gap
(16.2 vs 8.36 ms/step) this probe exists to explain.

Run: B=64 python benchmarks/probe_macro.py      (TPU)
Env: B (batch), DS (decode_steps), NT (new tokens, default 96)
"""

import os
import sys
import time

os.environ["VFS_MACRO_TRACE"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("B", "64"))
DS = int(os.environ.get("DS", "32"))
NT = int(os.environ.get("NT", "96"))


def main():
    os.environ["VFS_BENCH_BATCH"] = str(B)
    os.environ["VFS_BENCH_DECODE_STEPS"] = str(DS)
    from bench_midsize import build_engine

    from vllm_from_scratch_tpu.core.config import SamplingParams

    eng = build_engine(B, DS)
    rng = np.random.RandomState(0)
    sp = SamplingParams(max_new_tokens=NT, temperature=0.0, ignore_eos=True)
    prompts = [list(rng.randint(1, 31999, 512)) for _ in range(B)]
    t0 = time.perf_counter()
    eng.generate([list(p) for p in prompts], sp)  # warm/compile
    print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)

    eng._macro_log.clear()
    prompts = [list(rng.randint(1, 31999, 512)) for _ in range(B)]
    ids = [eng.add_request(p, sp) for p in prompts]
    t0 = time.perf_counter()
    steps = []          # wall per engine.step() call once decoding
    first_seen = set()
    while eng.has_unfinished:
        s0 = time.perf_counter()
        emitted = eng.step()
        s1 = time.perf_counter()
        for rid, _ in emitted:
            first_seen.add(rid)
        if len(first_seen) == len(ids):
            steps.append((s1 - s0, len(emitted)))
    wall = time.perf_counter() - t0

    # The log holds two record kinds: pump records (decode macros; have
    # "B"/"cont_ms"/"fetch_ms") and async records (prefill/mixed dispatches;
    # have "Bp"/"Bd"/phase timings) — print each in its own shape.
    log = [m for m in eng._macro_log if "B" in m]
    alog = [m for m in eng._macro_log if m.get("kind") == "async"]
    print(f"\n== B={B} DS={DS} NT={NT}: {len(log)} macros "
          f"+ {len(alog)} async dispatches, wall {wall:.2f}s")
    if alog:
        print(f"{'Bp':>4} {'Bd':>4} {'K':>4} {'sched_ms':>9} {'stale_ms':>9} "
              f"{'disp_ms':>8} {'commit_ms':>10}")
        for m in alog:
            print(f"{m['Bp']:>4} {m['Bd']:>4} {m['K']:>4} "
                  f"{m['sched_ms']:>9.1f} {m['stale_ms']:>9.1f} "
                  f"{m['dispatch_ms']:>8.1f} {m['commit_ms']:>10.1f}")
    print(f"{'K':>4} {'B':>4} {'cont_ms':>9} {'fetch_ms':>9} "
          f"{'update_ms':>10} {'cont?':>6}")
    for m in log:
        print(f"{m['K']:>4} {m['B']:>4} {m['cont_ms']:>9.1f} "
              f"{m['fetch_ms']:>9.1f} {m['update_ms']:>10.1f} "
              f"{str(m['had_cont']):>6}")
    tot_toks = sum(m["K"] * m["B"] for m in log)
    tot_cont = sum(m["cont_ms"] for m in log)
    tot_fetch = sum(m["fetch_ms"] for m in log)
    tot_upd = sum(m["update_ms"] for m in log)
    n_steps = sum(m["K"] for m in log)
    print(f"\nper decode step (ms): cont {tot_cont/n_steps:.2f}  "
          f"fetch {tot_fetch/n_steps:.2f}  update {tot_upd/n_steps:.2f}")
    print(f"macro-window decode rate: {tot_toks / wall:.0f} tok/s "
          f"({1e3 * wall / n_steps:.2f} ms/step incl. prefill tail)")


if __name__ == "__main__":
    main()
