"""Prefill chunk-size sweep: TTFT + prefill MFU vs max_num_batched_tokens.

Chunked prefill trades TTFT for decode fairness (ref rationale:
/root/reference/BLOG_PART2_V2.md:1061-1096).  This sweep measures the
other side of the trade on v5e: each doubling of the chunk halves the
number of sequential prefill dispatches (each paying tunnel/dispatch
latency plus a partially-filled MXU) until one chunk swallows the whole
B x 512-token burst.  Each point runs in a separate process (same reason
as sweep_batch.py).  Run: python benchmarks/sweep_chunk.py [chunk ...]
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHUNKS = [int(c) for c in sys.argv[1:]] or [512, 1024, 2048, 4096, 8192]

CHILD = r"""
import json, os, sys
sys.path.insert(0, {root!r})
os.environ["VFS_BENCH_CHUNK"] = "{chunk}"
from benchmarks.bench_midsize import run_engine
r = run_engine(verbose=True, new_tokens=32)
print("SWEEPJSON " + json.dumps(r), flush=True)
"""


def main():
    root = os.path.dirname(HERE)
    rows = []
    for c in CHUNKS:
        print(f"=== chunk {c} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, "-c", CHILD.format(root=root, chunk=c)],
            cwd=root, capture_output=True, text=True, timeout=3600,
        )
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            print(f"chunk {c}: FAILED (rc={proc.returncode})", flush=True)
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("SWEEPJSON "):
                r = json.loads(line[len("SWEEPJSON "):])
                r["chunk"] = c
                rows.append(r)
    print("\nchunk  p50_ttft_ms  prefill_tok/s  prefill_MFU%")
    for r in rows:
        print(f"{r['chunk']:>5}  {r['p50_ttft_ms']:>11.0f}  "
              f"{r['prefill_tokens_per_s']:>13.0f}  {r['prefill_mfu_pct']:>11.1f}")
    with open(os.path.join(HERE, "sweep_chunk.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
