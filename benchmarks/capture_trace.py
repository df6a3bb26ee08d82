"""Capture a jax.profiler trace of midsize decode macro-steps (TPU).

Writes a TensorBoard-loadable trace to --out (default /tmp/vfs_trace) —
the op-level attribution tool for the residual ~0.8 ms/step engine-vs-probe
gap and the per-pallas-call overhead (benchmarks/RESULTS.md r2).

Run: python benchmarks/capture_trace.py [--out DIR] [--phase prefill]
View: python benchmarks/trace_summary.py DIR   (no tensorboard needed)

--phase prefill traces the chunked-prefill steps of a fresh 16 x 512-token
batch instead of decode macro-steps (the VERDICT r2 #3 prefill-MFU hunt).
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
    mk = lambda: list(rng.randint(1, 31999, 512))

    if "--phase" in sys.argv and \
            sys.argv[sys.argv.index("--phase") + 1] == "prefill":
        # Warm every prefill/mixed bucket with one full batch, then trace
        # the chunked prefill of a FRESH batch (4 steps at chunk 2048).
        sp_w = SamplingParams(max_new_tokens=2, temperature=0.0,
                              ignore_eos=True)
        eng.generate([mk() for _ in range(16)], sp_w)
        ids = [eng.add_request(mk(), sp_w) for _ in range(16)]
        with jax.profiler.trace(out):
            t0 = time.perf_counter()
            steps = 0
            first = set()
            while len(first) < 16:
                for rid, _ in eng.step():
                    first.add(rid)
                steps += 1
            jax.block_until_ready(eng.cache)
            dt = time.perf_counter() - t0
        while eng.has_unfinished:
            eng.step()
        print(f"traced {steps} prefill steps, 16x512 tokens "
              f"({dt*1e3:.0f} ms) -> {out}")
        return

    ids = [eng.add_request(mk(), sp) for _ in range(16)]
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
