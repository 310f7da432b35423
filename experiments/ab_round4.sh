#!/bin/bash
# One-shot runner for the round-4 TPU A/Bs (VERDICT.md round-3 tasks 1/3/4).
# Each point is a fresh subprocess so env flags can't leak across jit caches.
# Results append to experiments/results/ab_round4.jsonl.
#
#   bash experiments/ab_round4.sh
#
# Points:
#   headline            - default bench (driver headline + embedded step)
#   driver_cache_2048   - cache feed on a 2048px scene (fits the HBM gate)
#   driver_window_2048  - rolling-window slab feed, FCDGAN_SCENE_WINDOW_MB=16
#                         forces ~4 slabs on the same 2048px scene (the
#                         past-the-gate regime; VERDICT r3 task 1 acceptance:
#                         window >= ~80% of the cache rate on this scene)
#   driver_stream_2048  - the old pre-window streaming fallback for contrast
#   wsss_driver         - WSSS end-to-end adversarial-phase epochs/s (task 4)
#   rsss_driver         - RSSS end-to-end adversarial-phase epochs/s (task 4)
#   infer_fused_f32     - stitched inference w/ the stall-resistant rep
#   infer_fused_uint8     protocol (task 3): timestamps + discard-and-retry
set -u
cd "$(dirname "$0")/.."
mkdir -p experiments/results
OUT=experiments/results/ab_round4.jsonl
REPS=${REPS:-2}

emit() { printf '{"point": "%s", "rep": %d, "result": %s}\n' "$1" "$2" "$3" | tee -a "$OUT"; }

run_point() {
  local name="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  for rep in $(seq 1 "$REPS"); do
    echo "=== $name rep $rep (${envs[*]:-none}) $*" >&2
    line=$(env "${envs[@]}" timeout 2400 python bench.py "$@" 2>/tmp/ab_err | tail -1)
    if ! python -c 'import json,sys; json.loads(sys.argv[1])' "$line" 2>/dev/null; then
      tail_json=$(python - <<'PYEOF'
import json
try:
    with open("/tmp/ab_err", "rb") as f:
        tail = f.read()[-2000:].decode("utf-8", "replace")
except OSError:
    tail = "(no stderr captured)"
lines = [l for l in tail.splitlines() if l and not l.startswith("WARNING")]
print(json.dumps({"error": "no valid JSON output", "stderr_tail": lines[-8:]}))
PYEOF
)
      line="$tail_json"
    fi
    emit "$name" "$rep" "$line"
  done
}

run_point headline --
run_point driver_cache_2048 -- --driver --scene-px 2048
run_point driver_window_2048 FCDGAN_DRIVER_FEED=window FCDGAN_SCENE_WINDOW_MB=16 -- --driver --scene-px 2048
REPS=1 run_point driver_stream_2048 FCDGAN_DRIVER_FEED=stream -- --driver --scene-px 2048
run_point wsss_driver -- --wsss-driver
run_point rsss_driver -- --rsss-driver
run_point infer_fused_f32 FCDGAN_INFER_FEED=auto -- --inference --density-dtype float32
run_point infer_fused_uint8 FCDGAN_INFER_FEED=auto -- --inference --density-dtype uint8
echo "done; results in $OUT" >&2
