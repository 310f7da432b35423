#!/bin/bash
# One-shot runner for the round-2 queued TPU A/Bs (ROADMAP.md "Round 2
# continuation"). Run when the axon relay is healthy; each point is a fresh
# subprocess so env flags can't leak across jit caches. Results append to
# experiments/results/ab_round2.jsonl with the flag set recorded.
#
#   bash experiments/ab_round2.sh [quick]
#
# Points:
#   base         current defaults (includes the per-band 1-channel perception
#                rewrite landed unmeasured during the relay outage)
#   pool=pallas  Pallas fused 2x2 max-pool backward (FCDGAN_POOL=pallas)
#   driver       bench.py --driver (real-driver epochs/sec)
set -u
cd "$(dirname "$0")/.."
mkdir -p experiments/results
OUT=experiments/results/ab_round2.jsonl
REPS=${REPS:-2}

run_point() { # name, env assignments..., then -- , then bench args
  local name="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  for rep in $(seq 1 "$REPS"); do
    echo "=== $name rep $rep (${envs[*]:-none}) $*" >&2
    line=$(env "${envs[@]}" timeout 1800 python bench.py "$@" 2>/tmp/ab_err | tail -1)
    if [ -z "$line" ]; then
      echo "    FAILED: $(tail -2 /tmp/ab_err | head -1)" >&2
      line='{"error": "no output"}'
    fi
    printf '{"point": "%s", "rep": %d, "result": %s}\n' "$name" "$rep" "$line" | tee -a "$OUT"
  done
}

run_point base --
run_point pool_pallas FCDGAN_POOL=pallas --
if [ "${1:-}" != "quick" ]; then
  # --pretrain reports its own in-process split-vs-stacked perception A/B
  REPS=1 run_point pretrain -- --pretrain
  REPS=1 run_point driver -- --driver
  REPS=1 run_point infer_uint8 -- --inference --density-dtype uint8
fi
echo "done; results in $OUT" >&2
