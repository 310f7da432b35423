#!/bin/bash
# One-shot runner for the round-3 TPU A/Bs (VERDICT.md round-2 tasks 1/2/4/6).
# Each point is a fresh subprocess so env flags can't leak across jit caches.
# Results append to experiments/results/ab_round3.jsonl.
#
#   bash experiments/ab_round3.sh [quick]
#
# ADVICE r2 fixes vs ab_round2.sh: the captured line is VALIDATED as JSON
# before being committed to the results file, and failures embed a sanitized
# stderr tail instead of a bare {"error": "no output"}.
set -u
cd "$(dirname "$0")/.."
mkdir -p experiments/results
OUT=experiments/results/ab_round3.jsonl
REPS=${REPS:-2}

emit() { # name, rep, result-json
  printf '{"point": "%s", "rep": %d, "result": %s}\n' "$1" "$2" "$3" | tee -a "$OUT"
}

run_point() { # name, env assignments..., then -- , then bench args
  local name="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  for rep in $(seq 1 "$REPS"); do
    echo "=== $name rep $rep (${envs[*]:-none}) $*" >&2
    line=$(env "${envs[@]}" timeout 2400 python bench.py "$@" 2>/tmp/ab_err | tail -1)
    if ! python -c 'import json,sys; json.loads(sys.argv[1])' "$line" 2>/dev/null; then
      # embed a sanitized stderr tail so the failure cause is recorded
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

run_point base --
run_point pool_pallas FCDGAN_POOL=pallas --
if [ "${1:-}" != "quick" ]; then
  # --pretrain reports its own in-process split-vs-stacked perception A/B
  REPS=1 run_point pretrain -- --pretrain
  REPS=1 run_point driver -- --driver
  REPS=3 run_point infer_uint8 -- --inference --density-dtype uint8
  REPS=3 run_point infer_f32 -- --inference --density-dtype float32
  REPS=1 run_point wsss -- --wsss
  REPS=1 run_point rsss -- --rsss
fi
echo "done; results in $OUT" >&2
