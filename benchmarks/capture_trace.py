"""Capture a jax.profiler trace of midsize decode macro-steps (TPU).

Writes a TensorBoard-loadable trace to --out (default /tmp/vfs_trace) —
the op-level attribution tool for the residual ~0.8 ms/step engine-vs-probe
gap and the per-pallas-call overhead (benchmarks/RESULTS.md r2).

Run: python benchmarks/capture_trace.py [--out DIR]
View: tensorboard --logdir DIR  (or xprof)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    from bench_midsize import build_engine
    from vllm_from_scratch_tpu.core.config import SamplingParams

    out = "/tmp/vfs_trace"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]

    eng = build_engine()
    rng = np.random.RandomState(0)
    sp = SamplingParams(max_new_tokens=256, temperature=0.0, ignore_eos=True)
    ids = [eng.add_request(list(rng.randint(1, 31999, 512)), sp)
           for _ in range(16)]
    first = set()
    while len(first) < 16:
        for rid, _ in eng.step():
            first.add(rid)
    eng.step()  # compile + one warm macro-step

    with jax.profiler.trace(out):
        t0 = time.perf_counter()
        for _ in range(3):
            eng.step()
        jax.block_until_ready(eng.cache)
        dt = time.perf_counter() - t0
    print(f"traced 3 macro-steps ({dt*1e3:.0f} ms) -> {out}")


if __name__ == "__main__":
    main()
