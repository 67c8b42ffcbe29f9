#!/bin/bash
# Poll CpuProbe; when a clean window appears (32-thread probe >= threshold),
# run the full Bench and keep the result iff the bench itself saw a clean
# window (no window_capped flags). Repeats until success or max attempts.
# Usage: bench_when_clean.sh <outJson> [threshold] [maxHours]
set -u
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
OUT="${1:?usage: bench_when_clean.sh <outJson> [threshold] [maxHours]}"
THRESH="${2:-0.85}"
MAX_HOURS="${3:-4}"
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  PROBE=$("$REPO_ROOT"/scripts/run_main.sh graft.tools.CpuProbe 2>/dev/null |
    awk '/probe\[32 threads\]/ {print $NF}')
  echo "$(date +%T) probe=$PROBE"
  if awk -v p="${PROBE:-0}" -v t="$THRESH" 'BEGIN{exit !(p>=t)}'; then
    echo "$(date +%T) clean window — running bench"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      "$REPO_ROOT"/scripts/run_main.sh graft.Bench > /tmp/bench_clean_try.log 2>&1
    LINE=$(grep -a '^{"metric"' /tmp/bench_clean_try.log | tail -1)
    if [ -n "$LINE" ] && echo "$LINE" | grep -q '"window_capped":{}'; then
      echo "$LINE" > "$OUT"
      echo "$(date +%T) clean bench captured -> $OUT"
      exit 0
    fi
    echo "$(date +%T) bench ran but window capped mid-run; will retry"
  fi
  sleep 300
done
echo "no clean window within ${MAX_HOURS}h"
exit 1
