"""Batch-size sweep on the midsize engine: find the chip's serving ceiling.

Decode at this shape is weight-streaming-bound (benchmarks/RESULTS.md r2
anatomy), so per-step cost is nearly flat in B until the KV stream and MXU
work catch up — tok/s/chip should scale ~linearly for several doublings.
This sweep measures where the engine actually saturates (VERDICT r2 #1);
the peak batch feeds bench.py's headline.

Each point runs in a SEPARATE process: per-B bucket programs would
otherwise accumulate in device memory, and a fresh process keeps points
independent.  Run: python benchmarks/sweep_batch.py [B ...]
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

BATCHES = [int(b) for b in sys.argv[1:]] or [16, 32, 64, 128, 256]

CHILD = r"""
import json, os, sys
sys.path.insert(0, {root!r})
from benchmarks.bench_midsize import run_engine
r = run_engine(verbose=True, batch={batch})
print("SWEEPJSON " + json.dumps(r), flush=True)
"""


def main():
    root = os.path.dirname(HERE)
    rows = []
    for b in BATCHES:
        print(f"=== batch {b} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, "-c", CHILD.format(root=root, batch=b)],
            cwd=root, capture_output=True, text=True, timeout=3600,
        )
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            print(f"batch {b}: FAILED (rc={proc.returncode})", flush=True)
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("SWEEPJSON "):
                rows.append(json.loads(line[len("SWEEPJSON "):]))
    print("\nbatch  tok/s   ms/step  tok/s/seq  p50_ttft_ms  kv_peak")
    for r in rows:
        ms = 1000 * r["batch"] / r["decode_tps"]
        print(f"{r['batch']:>5}  {r['decode_tps']:>6.0f}  {ms:>7.2f}"
              f"  {r['decode_tps']/r['batch']:>9.1f}  {r['p50_ttft_ms']:>11.0f}"
              f"  {r['kv_usage_peak']:>7.3f}")
    if rows:
        peak = max(rows, key=lambda r: r["decode_tps"])
        print(f"\npeak: {peak['decode_tps']:.0f} tok/s at B={peak['batch']}")
    with open(os.path.join(HERE, "sweep_batch.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
