#!/bin/bash
# Round-5 gate queue, part 2: fourier seed 1 with the EMA-symmetric
# scoring fix (both arms scored at their final EMA), then a gpt4_s seed-0
# attempt at img 96 if wall-clock remains.
set -u
cd /root/repo
OUT=/tmp/gates_r5
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
run fourier 1 96 2000
run gpt4_s 0 96 1000
echo "ALL DONE $(date -u)" >> "$OUT/queue.log"
