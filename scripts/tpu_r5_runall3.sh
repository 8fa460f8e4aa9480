#!/bin/bash
# Round-5 third hardware session: chroma-HORIZONTAL parity on chip,
# then the scenario sweep refresh (row 7 fused-encode cost is 3x
# stale after the MXU SAD + unroll landed).
set -u
cd "$(dirname "$0")/.."
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date -u +%FT%TZ) ==="
  timeout "$tmo" "$@"
  echo "=== $name rc=$? end $(date -u +%FT%TZ) ==="
}
run chromah_hw 7200 python scripts/tpu_r5_chromah_hw.py
run scenarios 10800 python -m bench.scenarios
echo "=== ALL DONE $(date -u +%FT%TZ) ==="
