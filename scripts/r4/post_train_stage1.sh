#!/bin/bash
# Round-4 post-training TPU chain, stage 1 (VERDICT r3 tasks #1/#2):
# hardware gate (hybrid-MDS Mosaic entry), converged-checkpoint mml
# calibration, serving envelope v2 (incl. hybridMDS row), and serving
# throughput with batched vs hybrid MDS. Run as ONE background job so
# only one TPU client exists at a time; never kill mid-run.
#
#   bash scripts/r4/post_train_stage1.sh <ckpt-dir>  # .../ckpt-best
set -uo pipefail
CKPT=${1:?usage: post_train_stage1.sh <orbax ckpt dir (ckpt-best)>}
cd /root/repo
OUT=/tmp/r4_stage1
mkdir -p $OUT

echo "=== [1/6] tpu_smoke (hardware gate incl. mds hybrid) ==="
python scripts/tpu_smoke.py 2>&1 | tee $OUT/smoke.log
grep -q "GATE PASS" $OUT/smoke.log || { echo "STAGE1 ABORT: gate failed"; exit 1; }

echo "=== [2/6] calibrate_mml on the converged checkpoint ==="
python scripts/calibrate_mml.py --model sparenet --weights "$CKPT" \
    2>&1 | tee $OUT/calibrate.log
RATIO=$(grep -oP 'ratio: mean \K[0-9.]+' $OUT/calibrate.log | head -1)
echo "fitted ratio: ${RATIO:-<none>}"

echo "=== [3/6] serving envelope v2 (converged ckpt, hybrid row) ==="
python scripts/r3/serving_envelope.py --weights "$CKPT" --batch 16 \
    ${RATIO:+--calibration $RATIO} 2>&1 | tee $OUT/envelope.log

echo "=== [4/6] bench serving (batched MDS, current default) ==="
python bench.py 2>&1 | tee $OUT/bench_batched.json

echo "=== [5/6] bench serving (hybrid MDS, tail 2048 / 1024) ==="
SPARENET_MDS_IMPL=hybrid python bench.py 2>&1 | tee $OUT/bench_hybrid.json
SPARENET_MDS_IMPL=hybrid SPARENET_MDS_TAIL=1024 python bench.py \
    2>&1 | tee $OUT/bench_hybrid_t1024.json

echo "=== [6/6] bench parity (fp32) ==="
BENCH_DTYPE=fp32 python bench.py 2>&1 | tee $OUT/bench_parity.json

echo "STAGE1 DONE"
