"""Server-restart cost: warmup() wall time, cold vs warm compile cache.

VERDICT r3 #4: a production restart must not re-pay compiles it paid
yesterday.  With the persistent compile cache (utils/compile_cache.py)
enabled, warmup()'s program set deserializes from disk instead of
recompiling — this bench runs the SAME engine config in two consecutive
child processes and reports each one's warmup wall time plus the time to
first served token after warmup.

Run: python benchmarks/bench_warmstart.py     (TPU)
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {root!r})
sys.path.insert(0, {here!r})
from vllm_from_scratch_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import numpy as np
from bench_midsize import build_engine
from vllm_from_scratch_tpu.core.config import SamplingParams

t0 = time.perf_counter()
eng = build_engine(16)
build_s = time.perf_counter() - t0

t0 = time.perf_counter()
n = eng.warmup(prompt_lens=(512,))
warmup_s = time.perf_counter() - t0

rng = np.random.RandomState(0)
sp = SamplingParams(max_new_tokens=8, temperature=0.0, ignore_eos=True)
t0 = time.perf_counter()
eng.add_request(list(rng.randint(1, 31999, 512)), sp)
first_s = None
while eng.has_unfinished:
    if eng.step() and first_s is None:
        first_s = time.perf_counter() - t0
print("WSJSON " + json.dumps({
    "build_s": round(build_s, 1), "warmup_programs": n,
    "warmup_s": round(warmup_s, 1),
    "ttft_after_warmup_s": round(first_s, 3)}), flush=True)
"""


def run_once(tag):
    proc = subprocess.run(
        [sys.executable, "-u", "-c",
         CHILD.format(root=os.path.dirname(HERE), here=HERE)],
        capture_output=True, text=True, timeout=3600)
    row = None
    for line in proc.stdout.splitlines():
        if line.startswith("WSJSON "):
            row = json.loads(line[len("WSJSON "):])
    if row is None:
        sys.stderr.write(proc.stderr[-2000:])
        raise RuntimeError(f"{tag}: no WSJSON (rc={proc.returncode})")
    print(f"{tag}: {row}", flush=True)
    return row


def main():
    first = run_once("process 1 (cache state: as found)")
    second = run_once("process 2 (warm disk cache)")
    print(f"restart cost: warmup {first['warmup_s']}s -> "
          f"{second['warmup_s']}s", flush=True)
    with open(os.path.join(HERE, "bench_warmstart.json"), "w") as f:
        json.dump({"first": first, "second": second}, f, indent=1)


if __name__ == "__main__":
    main()
