#!/bin/bash
# Round-4 post-training TPU chain, stage 2 (VERDICT r3 task #4):
# training-step decomposition + the TRAIN_COMMUTE / remat A/Bs, plus
# HEAD bench_train numbers on the converged checkpoint.
#
#   bash scripts/r4/post_train_stage2.sh <ckpt-dir>
set -uo pipefail
CKPT=${1:?usage: post_train_stage2.sh <orbax ckpt dir>}
cd /root/repo
OUT=/tmp/r4_stage2
mkdir -p $OUT

echo "=== [1/7] bench_train B=24 (chamfer+emd, trained regime) ==="
B=24 WEIGHTS="$CKPT" python scripts/bench_train.py 2>&1 | tee $OUT/bench_train_b24.log

echo "=== [2/7] decomp B=24 chamfer (dense stage) ==="
B=24 METRIC=chamfer python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/decomp_chamfer_dense.log

echo "=== [3/7] decomp B=24 chamfer (TRAIN_COMMUTE) ==="
B=24 METRIC=chamfer SPARENET_TRAIN_COMMUTE=1 python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/decomp_chamfer_commute.log

echo "=== [4/7] decomp B=24 emd (dense) ==="
B=24 METRIC=emd python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/decomp_emd_dense.log

echo "=== [5/7] decomp B=24 emd (TRAIN_COMMUTE) ==="
B=24 METRIC=emd SPARENET_TRAIN_COMMUTE=1 python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/decomp_emd_commute.log

echo "=== [6/7] B=32 chamfer: remat / commute HBM check ==="
B=32 METRIC=chamfer REMAT=1 python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/b32_remat.log
B=32 METRIC=chamfer SPARENET_TRAIN_COMMUTE=1 python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/b32_commute.log
B=32 METRIC=chamfer python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/b32_dense.log

echo "=== [7/7] bench_train B=24/32 with TRAIN_COMMUTE ==="
B=24 WEIGHTS="$CKPT" SPARENET_TRAIN_COMMUTE=1 python scripts/bench_train.py 2>&1 | tee $OUT/bench_train_commute.log
B=32 WEIGHTS="$CKPT" SPARENET_TRAIN_COMMUTE=1 METRIC=chamfer python scripts/bench_train.py 2>&1 | tee $OUT/bench_train_b32_commute.log

echo "STAGE2 DONE"
