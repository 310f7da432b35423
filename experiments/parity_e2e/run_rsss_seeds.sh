#!/bin/bash
# RSSS multi-seed parity study (VERDICT.md round-3 task 2): >=3 seeds per
# side on the same synthetic OSCD data (make_oscd_dataset seed 0 — scenes
# are bit-identical across runs), reference via the torchvision/osgeo shims,
# rebuild in parity mode (float32, split siamese BN stats). Seed 0 results
# already exist (results/rsss_{reference,rebuild_parity}.json, round 3);
# this runs seeds 1 and 2 for each side, sequentially (single-core host).
#
#   bash experiments/parity_e2e/run_rsss_seeds.sh
set -u
cd "$(dirname "$0")"
D=/tmp/h2h_rsss
R=results
mkdir -p "$R"

if [ ! -d "$D" ]; then
  python run_rsss.py data "$D" 256 256 0
fi

for seed in 1 2; do
  if [ ! -f "$R/rsss_reference_s${seed}.json" ]; then
    echo "=== reference seed $seed" >&2
    timeout 7200 python run_rsss.py reference "$D" 10 20 20 12 \
      "$R/rsss_reference_s${seed}.json" --seed "$seed"
  fi
  if [ ! -f "$R/rsss_rebuild_parity_s${seed}.json" ]; then
    echo "=== rebuild-parity seed $seed" >&2
    timeout 7200 python run_rsss.py rebuild "$D" 10 20 20 12 \
      "$R/rsss_rebuild_parity_s${seed}.json" --mode parity --seed "$seed"
  fi
done
echo "done" >&2
