#!/bin/bash
# Round-5 converged-gate queue (VERDICT r4 #3), v2 ordering.
#
# The v1 queue ran gpt4_s@160px/2000ep first; its ours-arm alone measured
# ~1.9 h per 500 epochs on this 1-core host — the 4-run queue could not
# fit the round.  v2 runs the CHEAP fourier arms (1/16-width fuse3-fourier
# mini + the full reference aux path — the paper's actual contribution)
# for both seeds first, then gpt4_s at a reduced but saturating protocol
# (img 128, 1200 full-batch steps): partial completion still covers both
# arms at seed 0.  Protocol otherwise identical to the round-4 add_s gate:
# 8 train images, nbs=batch (no accumulation), warmup floor 50.
set -u
cd /root/repo
OUT=/tmp/gates_r5
mkdir -p "$OUT"
run() {
  local fusion=$1 seed=$2 img=$3 epochs=$4
  local tag="${fusion}_s${seed}"
  echo "=== $tag start $(date -u +%H:%M:%S) ===" >> "$OUT/queue.log"
  JAX_PLATFORMS=cpu nice -n 10 python tools/converged_parity.py \
    --fusion "$fusion" --seed "$seed" --img "$img" \
    --epochs "$epochs" --n-train 8 --n-val 8 --batch 8 --nbs 8 \
    --warmup-floor 50 --out "$OUT/$tag" \
    > "$OUT/$tag.log" 2>&1
  echo "=== $tag rc=$? end $(date -u +%H:%M:%S) ===" >> "$OUT/queue.log"
}
run fourier 0 96 2000
run fourier 1 96 2000
run gpt4_s 0 128 1200
run gpt4_s 1 128 1200
echo "ALL DONE $(date -u)" >> "$OUT/queue.log"
