#!/bin/bash
# Round-5 device chain, stage 5: regenerate a trained-regime flagship
# checkpoint (the round-4 checkpoints lived in /tmp and were lost to a
# machine recycle — see docs/STATUS.md round 5), then run the
# checkpoint-dependent VERDICT r4 items on it, most-valuable-first so a
# round-end cutoff loses the least:
#   0. schedule-overhead probe (headline-speed attribution);
#   1. train flagship ~8 epochs (r4 recipe, shortened);
#   1b. archive the checkpoint INTO GIT (bf16 npz) + mml calibration;
#   1c. multi-batch quality envelope incl. pack16 rows;
#   2. FPD per-category round + the synthetic_3 (torus) diagnostic;
#   3. GAN-vs-plain segment A/B (skipped if past the deadline).
# Run in background to natural completion (ONE TPU client at a time).
set -uo pipefail
cd /root/repo
OUT=${OUT:-/tmp/r5_stage5}
EPOCHS=8
GAN_EPOCHS=1
# skip lower-priority tail work after this time (driver closes ~11:10)
DEADLINE_GAN=${DEADLINE_GAN:-1055}
mkdir -p $OUT

echo "=== [0/4] schedule-overhead probe ==="
python scripts/r5/profile_sched_overhead.py 2>&1 \
    | tee $OUT/sched_overhead.log

echo "=== [1/4] train flagship ($EPOCHS epochs, r4 recipe) ==="
python train.py --model sparenet --config scripts/r4/train_conv_sparenet.yaml \
    --epochs "$EPOCHS" --workdir $OUT/train \
    2>&1 | tee $OUT/train.log | grep -E "epoch|Saved|best|Error|error" | tail -200
CKPT=$(ls -d $OUT/train/checkpoints/*/ckpt-best 2>/dev/null | head -1)
if [ -z "$CKPT" ]; then echo "STAGE5 ABORT: no checkpoint"; exit 1; fi
echo "checkpoint: $CKPT"

echo "=== [1b/4] archive checkpoint (bf16 npz) + calibrate mml ==="
mkdir -p docs/artifacts/r5
python -m sparenet_tpu.utils.ckpt_npz export "$CKPT" \
    docs/artifacts/r5/flagship_e${EPOCHS}_bf16.npz
git add docs/artifacts/r5/flagship_e${EPOCHS}_bf16.npz \
    && git commit -q -m "Archive the round-5 flagship checkpoint (epoch-$EPOCHS best, bf16 npz)" \
    || echo "(archive commit skipped)"
python scripts/calibrate_mml.py --model sparenet --weights "$CKPT" \
    2>&1 | tee $OUT/calibrate.log | tail -5

echo "=== [1c/4] multi-batch envelope on the new checkpoint (pack16 rows) ==="
RATIO=$(grep -oP 'ratio: mean \K[0-9.]+' $OUT/calibrate.log | head -1)
PACK16=1 FULL=0 python scripts/r5/envelope_multibatch.py --weights "$CKPT" \
    --calibration "${RATIO:-1.15}" --batches 8 --batch 16 \
    --json-out $OUT/envelope_r5ckpt.json 2>&1 | tee $OUT/envelope_r5ckpt.log

mkdir -p docs/artifacts/r5/stage5
cp $OUT/sched_overhead.log $OUT/calibrate.log $OUT/envelope_r5ckpt.* \
    docs/artifacts/r5/stage5/ 2>/dev/null
git add docs/artifacts/r5/stage5 && git commit -q \
    -m "Archive stage-5 evidence: sched-overhead probe, calibration, fresh-ckpt envelope" \
    || true

echo "=== [2/4] FPD per-category round + torus diagnostic ==="
python scripts/r4/fpd_round.py --weights "$CKPT" \
    --out $OUT/fpd_round.json 2>&1 | tee $OUT/fpd_round.log | tail -40
python scripts/r5/diag_fpd_torus.py --weights "$CKPT" --n 200 \
    --outdir $OUT/fpd_diag 2>&1 | tee $OUT/diag_fpd_torus.log | tail -40
cp $OUT/fpd_round.json $OUT/fpd_round.log $OUT/diag_fpd_torus.log \
    docs/artifacts/r5/stage5/ 2>/dev/null
cp -r $OUT/fpd_diag docs/artifacts/r5/stage5/ 2>/dev/null
git add docs/artifacts/r5/stage5 && git commit -q \
    -m "Archive stage-5 FPD round + torus diagnostic" || true

NOW=$(date +%H%M)
if [ "$NOW" -lt "$DEADLINE_GAN" ]; then
  echo "=== [4/4] GAN vs plain segment A/B ==="
  python scripts/r5/gan_ab.py --weights "$CKPT" --epochs "$GAN_EPOCHS" \
      --batch 8 --n-train 768 --n-eval 200 \
      --out $OUT/gan_ab 2>&1 | tee $OUT/gan_ab.log | tail -40
else
  echo "=== [4/4] SKIPPED (past deadline $DEADLINE_GAN)"
fi

echo "STAGE5 DONE $(date)"
