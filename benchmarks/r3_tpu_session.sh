#!/bin/bash
# Round-3 TPU measurement session: everything that needs the real chip, in
# dependency order, one invocation (the axon tunnel pays 200-400 s per cold
# Mosaic compile — batch the work, don't round-trip).
# Usage: bash benchmarks/r3_tpu_session.sh [stage ...]   (default: all)
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/r3_tpu_session.log
stages=("$@")
# Headline first: if the tunnel flakes again mid-session, the decision-
# critical measurements (bench / bench64 / unroll / int4) land before the
# long gate + sweep stages.
[ ${#stages[@]} -eq 0 ] && stages=(bench bench64 unroll int4probe int4bench gate sweepb chunk itl serving trace)

run() { echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a "$LOG"; shift; "$@" 2>&1 | tee -a "$LOG"; }

for s in "${stages[@]}"; do
  case "$s" in
    gate)      # on-chip Mosaic equivalence: kernels + INT4 + engine e2e
      run gate env VFS_TPU_REAL_DEVICE=1 timeout 5400 python -u -m pytest \
        tests/test_pallas_kernels.py \
        "tests/test_moe.py::TestFusedMoEKernel" \
        "tests/test_moe.py::TestMosaicConstraintShapes" \
        tests/test_tpu_engine_e2e.py -q ;;
    int4probe) run int4probe timeout 3600 python -u benchmarks/probe_int4.py ;;
    bench)     run bench timeout 3600 python -u benchmarks/bench_midsize.py ;;
    int4bench) run int4bench env VFS_BENCH_WEIGHT_QUANT=int4 VFS_BENCH_ITL=0 \
                 timeout 3600 python -u benchmarks/bench_midsize.py ;;
    chunk)     run chunk timeout 5400 python -u benchmarks/sweep_chunk.py 1024 2048 4096 8192 ;;
    itl)       run itl timeout 3600 python -u -c \
                 "import sys; sys.path.insert(0,'.'); from benchmarks.bench_midsize import run_mixed_itl; run_mixed_itl()" ;;
    serving)   run serving timeout 3600 python -u benchmarks/bench_serving.py ;;
    bench64)   run bench64 env VFS_BENCH_DECODE_STEPS=64 VFS_BENCH_ITL=0 \
                 timeout 3600 python -u benchmarks/bench_midsize.py ;;
    unroll)    run unroll env VFS_UNROLL_LAYERS=1 VFS_BENCH_ITL=0 \
                 timeout 3600 python -u benchmarks/bench_midsize.py ;;
    sweepb)    run sweepb timeout 5400 python -u benchmarks/sweep_batch.py ;;
    trace)     run trace timeout 3600 python -u benchmarks/capture_trace.py ;;
    *) echo "unknown stage $s" ;;
  esac
done
