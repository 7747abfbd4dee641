#!/bin/bash
# Round-5 device chain, stage 3 (after the extended fine-tune):
#   1. re-calibrate mml on the new checkpoint,
#   2. multi-batch envelope on it (does G=8192 now pass <=2%?),
#   3. batched-MDS round-cost decomposition (top_k k-dependence),
# then hand off to stage2.sh (commute diag, GAN A/B, torus FPD,
# train-step benches).
set -uo pipefail
FT2=${1:?usage: stage3.sh <extended-fine-tune ckpt-best>}
cd /root/repo
OUT=${OUT:-/tmp/r5_stage3}
mkdir -p $OUT

echo "=== [1/3] calibrate mml on the extended-fine-tune checkpoint ==="
python scripts/calibrate_mml.py --model sparenet --weights "$FT2" \
    2>&1 | tee $OUT/calibrate_ft2.log
RATIO=$(grep -oP 'ratio: mean \K[0-9.]+' $OUT/calibrate_ft2.log | head -1)

echo "=== [2/3] batched-MDS round decomposition ==="
python scripts/r5/profile_mds_rounds.py 2>&1 | tee $OUT/mds_rounds.log

echo "=== [3/3] multi-batch envelope (ratio ${RATIO:-1.1497}) ==="
python scripts/r5/envelope_multibatch.py --weights "$FT2" \
    --calibration "${RATIO:-1.1497}" --batches 8 --batch 16 \
    --json-out $OUT/envelope_ft2.json 2>&1 | tee $OUT/envelope_ft2.log

echo "STAGE3 DONE"
