#!/bin/bash
# Round-5 device chain, stage 1 (VERDICT r4 task #1): bench the
# quality-neutral serving configuration and widen the quality contract
# to multiple val batches.
#  1. bench.py throughput at MDS round sizes G = 8192..2048 (fills the
#     dial table's blank "intermediate" throughput column);
#  2. multi-batch envelope on the fine-tuned checkpoint (variance bars
#     + the same G sweep on the quality side).
set -uo pipefail
FT=${1:?usage: stage1.sh <fine-tuned ckpt-best dir>}
cd /root/repo
OUT=${OUT:-/tmp/r5_stage1}
mkdir -p $OUT

echo "=== [1/2] bench.py G sweep (serving mode, B=32) ==="
for G in 8192 6144 4096 3072 2048; do
  echo "--- G=$G ---"
  SPARENET_MDS_BATCH_G=$G python bench.py 2>/dev/null | tee $OUT/bench_g$G.json
done

echo "=== [2/2] multi-batch envelope on the fine-tuned checkpoint ==="
python scripts/r5/envelope_multibatch.py --weights "$FT" \
    --calibration 1.1497 --batches 8 --batch 16 \
    --json-out $OUT/envelope_multibatch.json 2>&1 | tee $OUT/envelope_multibatch.log

echo "STAGE1 DONE"
