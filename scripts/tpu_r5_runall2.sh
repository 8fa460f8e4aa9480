#!/bin/bash
# Round-5 hardware follow-ups after the first session: the FIXED
# scenario sweep (the r4/r5 crasher was a UV reshape typo), the inter
# partition parity pack (new this round), and a single retry of the
# fused 4K search=4 stage that hit the mid-session TPU worker crash.
#
#   nohup bash scripts/tpu_r5_runall2.sh > scripts/tpu_r5_runall2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name start $(date -u +%FT%TZ) ==="
  timeout "$tmo" "$@"
  echo "=== $name rc=$? end $(date -u +%FT%TZ) ==="
}
run scenarios 10800 python -m bench.scenarios
run parts_hw  10800 python scripts/tpu_r5_parts_hw.py
run fused_search_retry 7200 python - <<'PYEOF'
import json, sys, os
sys.path.insert(0, ".")
import importlib.util
spec = importlib.util.spec_from_file_location(
    "fs", "scripts/tpu_r5_fused_search.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
out = json.load(open("scripts/tpu_r5_fused_search.json"))
try:
    g = m.measure(3840, 2160, 4, 0)
except Exception as e:
    g = {"width": 3840, "height": 2160, "search": 4, "subpel": 0,
         "error": f"retry: {type(e).__name__}: {e}"}
out["geometries"] = [x for x in out["geometries"]
                     if not (x.get("width") == 3840
                             and x.get("search") == 4
                             and x.get("subpel") == 0)] + [g]
four_k = [x for x in out["geometries"]
          if x.get("width") == 3840 and "ms_per_frame" in x]
if four_k:
    best = min(x["ms_per_frame"] for x in four_k)
    out["fused_4k60_with_search"] = bool(best <= 1000.0 / 60.0)
    out["fused_4k_best_ms"] = best
json.dump(out, open("scripts/tpu_r5_fused_search.json", "w"), indent=1)
print(json.dumps(g), flush=True)
PYEOF
echo "=== ALL DONE $(date -u +%FT%TZ) ==="
