#!/bin/bash
# Round-5 hardware validation backlog, one TPU process at a time.
# Each step is bounded and failures don't stop the chain; all output
# lands in scripts/.  Every script now enables the persistent JAX
# compilation cache (/root/.jax_cache), so re-runs after a tunnel
# outage skip the remote compiles they already paid for.
#
#   nohup bash scripts/tpu_r5_runall.sh > scripts/tpu_r5_runall.log 2>&1 &
#
# Order: highest-value evidence first (the fixed encoder soak clears
# the round-4 false-parity artifact; the sub-pel pack makes the
# fractional decision paths discriminating on chip), then the sweeps,
# then the compile-heaviest ladders, then the bench headline last so
# it lands even if earlier stages eat the window.
set -u
cd "$(dirname "$0")/.."
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date -u +%FT%TZ) ==="
  timeout "$tmo" "$@"
  echo "=== $name rc=$? end $(date -u +%FT%TZ) ==="
}
run enc_soak     10800 python scripts/tpu_r3_enc_soak.py
run subpel       10800 python scripts/tpu_r5_subpel.py
run scenarios    7200  python -m bench.scenarios
run motion       21600 python scripts/tpu_r3_motion.py
run fused_search 21600 python scripts/tpu_r5_fused_search.py
run bench        3600  python bench.py
echo "=== ALL DONE $(date -u +%FT%TZ) ==="
