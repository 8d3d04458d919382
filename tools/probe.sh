#!/bin/bash
# Decade-probe wrapper: runs graft.BenchOne on one named query under a disk watchdog
# (a kneeing query can write 60+ GB/min of shuffle to /tmp/blockmgr-*), with a hard
# wall-clock timeout. Usage:
#   tools/probe.sh <sfDir> <timeoutSec> <query> [query...]
# Env passthrough: SPARK_GRAFT_SHUFFLE, SPARK_GRAFT_BENCH_REPS, SPARK_GRAFT_CPUS.
# Each query runs in its own JVM so one death can't poison the next measurement.
cd "$(dirname "$0")/.." || exit 1
SFDIR="$1"; TMO="$2"; shift 2
for q in "$@"; do
  timeout --signal=KILL "$TMO" \
    env SPARK_GRAFT_SF_DIR="$SFDIR" tools/run.sh graft.BenchOne "$q" \
    > "target/probe_${q}.log" 2>&1 &
  PID=$!
  while kill -0 $PID 2>/dev/null; do
    USE=$(df --output=pcent / | tail -1 | tr -dc '0-9')
    if [ "$USE" -ge 80 ]; then
      echo "PROBE $q KILLED: disk watchdog at ${USE}%"
      kill -9 $PID
      sleep 2
      rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
      break
    fi
    sleep 5
  done
  wait $PID 2>/dev/null
  RC=$?
  LINE=$(grep -h "^TIMING" "target/probe_${q}.log" | tail -1)
  if [ -n "$LINE" ]; then echo "$LINE"; else echo "PROBE $q DIED rc=$RC (see target/probe_${q}.log)"; fi
  rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
done
