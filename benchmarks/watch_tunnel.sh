#!/bin/bash
# Poll the axon TPU tunnel; the moment a device grant arrives, run the
# round-3 measurement session (benchmarks/r3_tpu_session.sh).
#
# Background: the tunnel was down 13:27->? on 2026-08-17, leaving several
# committed perf changes (projection fusion, INT4 experts, mixed step,
# decode_steps=64, layer unroll) unmeasured.  jax.devices() BLOCKS while
# the tunnel is down ("grant unclaimed" loop), so each probe runs under
# timeout.  Usage: bash benchmarks/watch_tunnel.sh [stage ...]
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tunnel_watch.log
echo "watcher start $(date)" >> "$LOG"
while true; do
  if timeout 240 python -c "import jax; jax.devices(); print('TUNNEL_UP')" 2>/dev/null | grep -q TUNNEL_UP; then
    echo "tunnel UP at $(date) — starting r3 session" >> "$LOG"
    bash benchmarks/r3_tpu_session.sh "$@" >> "$LOG" 2>&1
    echo "r3 session done at $(date)" >> "$LOG"
    break
  fi
  echo "down $(date)" >> "$LOG"
  sleep 180
done
