#!/bin/bash
# Round-5 measurement points (VERDICT r4 tasks), one sequential TPU chain.
#
#   headline              - default bench (driver headline + embedded step)
#   driver_window_packed5 - 5 reps of the rolling-window TRAINING feed on a
#                           2048px scene w/ slab-wait stall evidence (task 2)
#   infer_gate80_*        - forced-gate rolling-window SERVING (f32 scene,
#                           2-row slabs, the round-4 0.80 Mpx/s point):
#                           resident-canvas phased serving (task 1)
#   serve_ab_realistic    - in-process window-vs-fused ratio at a realistic
#                           gate (uint16 scene, slabs >= 1/8 scene; task 1
#                           acceptance: >= 80% of fused)
#   wsss_driver/rsss_driver - driver==step check for the other modes
#   infer_fused_*         - stitched serving headline w/ spread + ratio
#                           + device ceiling per row (task 7)
set -u
cd "$(dirname "$0")/.."
mkdir -p experiments/results
OUT=experiments/results/ab_round5.jsonl

run_point() {
  local name="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  local reps="${REPS:-1}"
  for rep in $(seq 1 "$reps"); do
    echo "=== $name rep $rep" >&2
    local line
    line=$(env "${envs[@]}" timeout 2400 python bench.py "$@" 2>/dev/null | tail -1)
    echo "{\"point\": \"$name\", \"rep\": $rep, \"result\": $line}" >> "$OUT"
  done
}

run_script() {
  local name="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name" >&2
  env "${envs[@]}" timeout 2400 python "$@" 2>/dev/null \
    | while IFS= read -r line; do
        echo "{\"point\": \"$name\", \"result\": $line}" >> "$OUT"
      done
}

run_point headline --
REPS=5 run_point driver_window_packed5 FCDGAN_DRIVER_FEED=window \
  FCDGAN_SCENE_WINDOW_MB=24 -- --driver --scene-px 2048
run_point infer_gate80_uint8 FCDGAN_INFER_DTYPE=float32 \
  FCDGAN_SCENE_CACHE_MAX_MB=80 -- --inference --density-dtype uint8 --scene-px 2048
run_script serve_ab_gate80 FCDGAN_SCENE_CACHE_MAX_MB=80 -- \
  experiments/window_serve_ab.py
run_script serve_ab_realistic FCDGAN_SCENE_CACHE_MAX_MB=40 SCENE_DT=uint16 -- \
  experiments/window_serve_ab.py
run_point wsss_driver -- --wsss-driver
run_point rsss_driver -- --rsss-driver
run_point infer_fused_f32 FCDGAN_INFER_FEED=auto -- --inference --density-dtype float32
run_point infer_fused_uint8 FCDGAN_INFER_FEED=auto -- --inference --density-dtype uint8
echo "done; results in $OUT" >&2
