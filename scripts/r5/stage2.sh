#!/bin/bash
# Round-5 device chain, stage 2: the remaining VERDICT r4 items that
# need the chip, in one background chain (ONE TPU client at a time):
#   1. diag_commute      — root-cause the red COMMUTE_HW gate (task #2)
#   2. gan_ab            — GAN epochs vs plain epochs, FPD/CD/F (task #6)
#   3. diag_fpd_torus    — explain the synthetic_3 anomaly (task #5)
#   4. bench_train       — training-step speed: parity vs serving-aligned
#                          (task #3; commute arm added after #1 resolves)
set -uo pipefail
CONV=${1:?usage: stage2.sh <converged ckpt-best> <finetuned ckpt-best>}
FT=${2:?usage: stage2.sh <converged ckpt-best> <finetuned ckpt-best>}
cd /root/repo
OUT=${OUT:-/tmp/r5_stage2}
mkdir -p $OUT

echo "=== [1/4] diag_commute ==="
python scripts/r5/diag_commute.py 2>&1 | tee $OUT/diag_commute.log

echo "=== [2/4] gan_ab (3 epochs GAN vs plain from the converged ckpt) ==="
python scripts/r5/gan_ab.py --weights "$CONV" --epochs 3 --batch 8 \
    --out $OUT/gan_ab 2>&1 | tee $OUT/gan_ab.log | grep -E "^\[|^==|DONE|Error"

echo "=== [3/4] diag_fpd_torus (fine-tuned ckpt) ==="
python scripts/r5/diag_fpd_torus.py --weights "$FT" \
    --outdir $OUT/fpd_diag 2>&1 | tee $OUT/diag_fpd_torus.log

echo "=== [4/4] bench_train B=24 chamfer: parity vs serving-aligned ==="
B=24 METRIC=chamfer python scripts/bench_train.py 2>&1 | tee $OUT/bench_train_parity.log
B=24 METRIC=chamfer SERVING_ALIGNED=1 python scripts/bench_train.py 2>&1 | tee $OUT/bench_train_aligned.log

echo "STAGE2 DONE"
