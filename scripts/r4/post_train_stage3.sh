#!/bin/bash
# Round-4 device chain, stage 3: edge-train-kernel gate + A/B, then the
# serving-aligned fine-tune (epochs 32->40 with batched MDS in the
# refine loop) and the envelope on the fine-tuned checkpoint.
set -uo pipefail
CKPT=${1:?usage: post_train_stage3.sh <orbax ckpt dir (ckpt-best)>}
cd /root/repo
OUT=/tmp/r4_stage3
mkdir -p $OUT

echo "=== [1/5] tpu_smoke (gate: edge_gather_stats fwd+vjp) ==="
python scripts/tpu_smoke.py 2>&1 | tee $OUT/smoke.log
if grep -q "GATE PASS" $OUT/smoke.log; then
  echo "=== [2/5] decomp B=24 chamfer (TRAIN_COMMUTE=pallas) ==="
  B=24 METRIC=chamfer SPARENET_TRAIN_COMMUTE=pallas \
    python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/decomp_chamfer_pallas.log
else
  echo "GATE FAILED - skipping pallas A/B"
fi

echo "=== [3/5] serving-aligned fine-tune (epochs 32->40, batched MDS) ==="
SPARENET_MDS_IMPL=batched python train.py --model sparenet \
    --config scripts/r4/train_conv_sparenet.yaml \
    --weights "$CKPT" --workdir /tmp/r4_finetune 2>&1 | tail -40 | tee $OUT/finetune_tail.log

FT=$(ls -dt /tmp/r4_finetune/checkpoints/*/ckpt-best 2>/dev/null | head -1)
echo "fine-tuned ckpt: ${FT:-<missing>}"
if [ -n "${FT:-}" ]; then
  echo "=== [4/5] calibrate fine-tuned ==="
  python scripts/calibrate_mml.py --model sparenet --weights "$FT" \
      2>&1 | tee $OUT/calibrate_ft.log
  RATIO=$(grep -oP 'ratio: mean \K[0-9.]+' $OUT/calibrate_ft.log | head -1)
  echo "=== [5/5] envelope on the fine-tuned checkpoint (ratio ${RATIO:-default}) ==="
  python scripts/r3/serving_envelope.py --weights "$FT" --batch 16 \
      ${RATIO:+--calibration $RATIO} 2>&1 | tee $OUT/envelope_ft.log
fi
echo "STAGE3 DONE"
