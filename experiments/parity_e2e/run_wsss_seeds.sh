#!/bin/bash
# WSSS multi-seed parity study (VERDICT.md round-4 task 5): 3 seeds per
# side on the same synthetic WHU set (make_whu_dataset seed 0 — slices are
# bit-identical across runs), reference via the torchvision/PIL shims,
# rebuild in parity mode (float32, split siamese BN stats) — the exact
# treatment RSSS got in round 4 (run_rsss_seeds.sh). Seed-0 results exist
# from round 3 (results/wsss_{reference,rebuild_parity}.json); this runs
# seeds 1 and 2 for each side, sequentially (single-core host).
#
#   bash experiments/parity_e2e/run_wsss_seeds.sh
set -u
cd "$(dirname "$0")"
D=/tmp/h2h_wsss
R=results
mkdir -p "$R"

if [ ! -d "$D" ]; then
  python run_wsss.py data "$D"
fi

for seed in 1 2; do
  if [ ! -f "$R/wsss_reference_s${seed}.json" ]; then
    echo "=== reference seed $seed" >&2
    timeout 10800 python run_wsss.py reference "$D" 10 20 15 50 \
      "$R/wsss_reference_s${seed}.json" --seed "$seed"
  fi
  if [ ! -f "$R/wsss_rebuild_parity_s${seed}.json" ]; then
    echo "=== rebuild-parity seed $seed" >&2
    timeout 10800 python run_wsss.py rebuild "$D" 10 20 15 50 \
      "$R/wsss_rebuild_parity_s${seed}.json" --mode parity --seed "$seed"
  fi
done
echo "done" >&2
