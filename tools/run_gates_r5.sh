#!/bin/bash
# Round-5 converged-gate queue (VERDICT r4 #3): transformer-fusion arms.
# Protocol identical to the round-4 add_s gate (CONVERGED_PARITY_r04.json):
#   2000 full-batch steps, 8 train images, nbs=batch (no accumulation),
#   warmup floor 50.  gpt4_s at img 160 (the reference's shipped
#   yolov5s_fusion_transformer_vedai.yaml); fourier at img 96 (the
#   1/16-width fuse3-fourier mini whose step parity is already pinned).
set -u
cd /root/repo
OUT=/tmp/gates_r5
mkdir -p "$OUT"
run() {
  local fusion=$1 seed=$2 img=$3
  local tag="${fusion}_s${seed}"
  echo "=== $tag start $(date -u +%H:%M:%S) ===" >> "$OUT/queue.log"
  JAX_PLATFORMS=cpu nice -n 10 python tools/converged_parity.py \
    --fusion "$fusion" --seed "$seed" --img "$img" \
    --epochs 2000 --n-train 8 --n-val 8 --batch 8 --nbs 8 \
    --warmup-floor 50 --out "$OUT/$tag" \
    > "$OUT/$tag.log" 2>&1
  echo "=== $tag rc=$? end $(date -u +%H:%M:%S) ===" >> "$OUT/queue.log"
}
run gpt4_s 0 160
run gpt4_s 1 160
run fourier 0 96
run fourier 1 96
echo "ALL DONE $(date -u)" >> "$OUT/queue.log"
