#!/bin/bash
# Tunnel watcher: probe the axon TPU every 10 minutes; the moment a
# tiny device program executes, launch the round-4 validation backlog
# (scripts/tpu_r4_runall.sh) ONCE and exit.  All TPU access stays
# serialized inside this single loop — never start another TPU
# process while this is running.
#
#   nohup bash scripts/tpu_watch.sh > scripts/tpu_watch.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 200); do
  echo "--- probe $i $(date -u +%FT%TZ)"
  if timeout 300 python scripts/tpu_probe.py; then
    echo "=== TUNNEL UP $(date -u +%FT%TZ) — starting backlog"
    bash scripts/tpu_r4_runall.sh > scripts/tpu_r4_runall.log 2>&1
    echo "=== BACKLOG DONE rc=$? $(date -u +%FT%TZ)"
    exit 0
  fi
  echo "--- tunnel down (rc=$?), sleeping 600s"
  sleep 600
done
echo "=== GAVE UP after 200 probes $(date -u +%FT%TZ)"
exit 1
