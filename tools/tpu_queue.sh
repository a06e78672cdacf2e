#!/bin/bash
# Post-relay measurement queue: runs the round-3 measurement backlog in
# priority order, strictly serialized (CLAUDE.md: never run two python
# processes against the tunneled TPU — concurrent sessions wedge in-flight
# compiles), each step in its own process with a hard timeout.
#
# Usage: bash tools/tpu_queue.sh [logdir]    (default /tmp/tpu_queue)
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_queue}"
mkdir -p "$LOG"

step() {   # step <name> <timeout-s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  echo "=== $(date -Is) $name (timeout ${tmo}s) ===" | tee -a "$LOG/queue.log"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -Is) $name rc=$rc ===" | tee -a "$LOG/queue.log"
  tail -3 "$LOG/$name.log" | tee -a "$LOG/queue.log"
}

# 1. the driver record: headline BFS first, JSON after every stage
step bench 7200 python bench.py

# 2. SpMV kernel variant sweep at rmat18 (unroll/fori x highest/hilo x
#    pack; target >=100 GB/s)
step bilinear 2400 python tools/tpu_bilinear_test.py 18

# 3. bitmap sweep variants (BFS pull kernel)
step bitmap 1800 python tools/tpu_bitmap_test.py

# 4. BFS direction + push-variant + SSSP tier tuning
step tune 3600 python tools/tpu_tune.py

echo "=== $(date -Is) queue done ===" | tee -a "$LOG/queue.log"
