#!/bin/bash
# Second round-3 A/B batch (run AFTER ab_round3.sh): the device-cache feed
# A/Bs and the re-gated pallas pool point.
#
#   bash experiments/ab_round3b.sh
#
# Points:
#   headline       - new default bench (driver headline + embedded step)
#   driver_stream  - driver bench with the pre-cache streaming feed
#   infer_stream   - stitched inference with the pre-cache streaming feed
#   pool_pallas    - FCDGAN_POOL=pallas with the c>=128 Mosaic gate fixed
set -u
cd "$(dirname "$0")/.."
mkdir -p experiments/results
OUT=experiments/results/ab_round3.jsonl
REPS=${REPS:-1}

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
run_point driver_stream FCDGAN_DRIVER_FEED=stream -- --driver
REPS=2 run_point infer_fused FCDGAN_INFER_FEED=auto -- --inference --density-dtype uint8
REPS=2 run_point infer_fused_f32 FCDGAN_INFER_FEED=auto -- --inference --density-dtype float32
REPS=2 run_point infer_cache FCDGAN_INFER_FEED=cache -- --inference --density-dtype uint8
REPS=2 run_point infer_stream FCDGAN_INFER_FEED=stream -- --inference --density-dtype uint8
REPS=2 run_point pool_pallas FCDGAN_POOL=pallas --
echo "done; results in $OUT" >&2
