#!/bin/bash
# Round-5 device chain, stage 5: regenerate a trained-regime flagship
# checkpoint (the round-4 checkpoints lived in /tmp and were lost to a
# machine recycle — see docs/STATUS.md round 5), then run the two
# checkpoint-dependent VERDICT r4 items on it:
#   1. train flagship SpareNet ~20 epochs (r4 recipe, shortened);
#   2. FPD per-category round + the synthetic_3 (torus) diagnostic;
#   3. GAN-vs-plain epochs A/B (what adversarial rendering buys).
# Run in background to natural completion (ONE TPU client at a time).
set -uo pipefail
cd /root/repo
OUT=${OUT:-/tmp/r5_stage5}
EPOCHS=${EPOCHS:-20}
GAN_EPOCHS=${GAN_EPOCHS:-2}
mkdir -p $OUT

echo "=== [1/4] train flagship ($EPOCHS epochs, r4 recipe) ==="
python train.py --model sparenet --config scripts/r4/train_conv_sparenet.yaml \
    --epochs "$EPOCHS" --workdir $OUT/train \
    2>&1 | tee $OUT/train.log | grep -E "epoch|Saved|best|Error|error" | tail -200
CKPT=$(ls -d $OUT/train/checkpoints/*/ckpt-best 2>/dev/null | head -1)
if [ -z "$CKPT" ]; then echo "STAGE5 ABORT: no checkpoint"; exit 1; fi
echo "checkpoint: $CKPT"

echo "=== [2/4] FPD per-category round (tracks the r4 416->205 series) ==="
python scripts/r4/fpd_round.py --weights "$CKPT" \
    --out $OUT/fpd_round.json 2>&1 | tee $OUT/fpd_round.log | tail -40

echo "=== [3/4] torus anomaly diagnostic ==="
python scripts/r5/diag_fpd_torus.py --weights "$CKPT" \
    --outdir $OUT/fpd_diag 2>&1 | tee $OUT/diag_fpd_torus.log | tail -60

echo "=== [4/4] GAN vs plain epochs A/B ==="
python scripts/r5/gan_ab.py --weights "$CKPT" --epochs "$GAN_EPOCHS" \
    --batch 8 --out $OUT/gan_ab 2>&1 | tee $OUT/gan_ab.log | tail -60

echo "STAGE5 DONE $(date)"
