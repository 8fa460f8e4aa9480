#!/bin/bash
# Round-4 hardware validation backlog, one TPU process at a time.
# Run only when the axon tunnel is up (scripts/tpu_r4_hw.py stage
# prints will show immediately if it is not).  Each step is bounded
# and failures don't stop the chain; all output lands in scripts/.
#
#   nohup bash scripts/tpu_r4_runall.sh > scripts/tpu_r4_runall.log 2>&1 &
#
# Order: cheapest/highest-value first (small-geometry parity pack ->
# bench headline -> complete-encoder soak -> fused GOP -> scenario
# sweep -> the motion timing ladder, which carries the largest remote-
# compile risk: the r3 intra program took 1875 s to compile at 1080p).
set -u
cd "$(dirname "$0")/.."
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date -u +%FT%TZ) ==="
  timeout "$tmo" "$@"
  echo "=== $name rc=$? end $(date -u +%FT%TZ) ==="
}
run parity_pack 7200  python scripts/tpu_r4_hw.py
run bench       3600  python bench.py
run enc_soak    10800 python scripts/tpu_r3_enc_soak.py
run fused_gop   10800 python scripts/tpu_r3_fused_gop.py
run scenarios   7200  python -m bench.scenarios
run motion      21600 python scripts/tpu_r3_motion.py
echo "=== ALL DONE $(date -u +%FT%TZ) ==="
