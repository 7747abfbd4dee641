#!/bin/bash
# Round-4 device chain, stage 4: GAN trained segment (VERDICT r3 #6),
# tracked FPD (r3 #7), and the bench_train HEAD numbers (r3 #4).
set -uo pipefail
CKPT=${1:?usage: post_train_stage4.sh <orbax ckpt dir (ckpt-best)>}
EARLY=${2:-}
cd /root/repo
OUT=/tmp/r4_stage4
mkdir -p $OUT

echo "=== [1/4] GAN trained segment (300 steps, B=8) ==="
python scripts/r4/gan_segment.py --weights "$CKPT" --steps 300 --batch 8 \
    --out /tmp/gan_segment 2>&1 | tail -50 | tee $OUT/gan_segment.log

echo "=== [2/4] FPD round (400 completions, canonical classifier) ==="
python scripts/r4/fpd_round.py --weights "$CKPT" \
    ${EARLY:+--early $EARLY} --out $OUT/fpd_round.json \
    2>&1 | tee $OUT/fpd_round.log

echo "=== [3/6] bench_train B=24 (chamfer+emd, trained regime) ==="
B=24 WEIGHTS="$CKPT" python scripts/bench_train.py 2>&1 | tee $OUT/bench_train_b24.log

echo "=== [4/6] bench_train B=24/32 chamfer, pallas train-commute ==="
B=24 METRIC=chamfer WEIGHTS="$CKPT" SPARENET_TRAIN_COMMUTE=pallas \
  python scripts/bench_train.py 2>&1 | tee $OUT/bench_train_b24_commute.log
B=32 METRIC=chamfer WEIGHTS="$CKPT" SPARENET_TRAIN_COMMUTE=pallas \
  python scripts/bench_train.py 2>&1 | tee $OUT/bench_train_b32_commute.log

echo "=== [5/6] bench_train B=32 chamfer (dense) ==="
B=32 METRIC=chamfer WEIGHTS="$CKPT" python scripts/bench_train.py 2>&1 | tee $OUT/bench_train_b32.log

echo "=== [6/6] on-chip value parity: dense vs pallas train-commute ==="
python scripts/r4/check_commute_hw.py 2>&1 | tee $OUT/commute_hw_parity.log
echo "STAGE4 DONE"
