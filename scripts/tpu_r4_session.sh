#!/bin/bash
# Round-4 in-session hardware backlog (tunnel returned 2026-08-19 04:04Z).
# Reordered from tpu_r4_runall.sh for a ~1h window: bench headline first,
# then the incremental parity pack, then the soaks as time allows.
set -u
cd "$(dirname "$0")/.."
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date -u +%FT%TZ) ==="
  timeout "$tmo" "$@"
  echo "=== $name rc=$? end $(date -u +%FT%TZ) ==="
}
run bench       1800  python bench.py
run parity_pack 7200  python scripts/tpu_r4_hw.py
run enc_soak    7200  python scripts/tpu_r3_enc_soak.py
run fused_gop   7200  python scripts/tpu_r3_fused_gop.py
run scenarios   7200  python -m bench.scenarios
run motion      21600 python scripts/tpu_r3_motion.py
echo "=== ALL DONE $(date -u +%FT%TZ) ==="
