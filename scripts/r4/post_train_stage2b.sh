#!/bin/bash
# Re-run of the stage-2 decomposition A/Bs with the fixed profiler
# (params as jit args; the closure version embedded ~660 MB of weight
# literals and hit the axon remote-compile request limit).
set -uo pipefail
cd /root/repo
OUT=/tmp/r4_stage2
mkdir -p $OUT

echo "=== [1/5] decomp B=24 chamfer (dense) ==="
B=24 METRIC=chamfer python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/decomp_chamfer_dense.log
echo "=== [2/5] decomp B=24 chamfer (TRAIN_COMMUTE) ==="
B=24 METRIC=chamfer SPARENET_TRAIN_COMMUTE=1 python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/decomp_chamfer_commute.log
echo "=== [3/5] decomp B=24 emd (dense) ==="
B=24 METRIC=emd python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/decomp_emd_dense.log
echo "=== [4/5] decomp B=24 emd (TRAIN_COMMUTE) ==="
B=24 METRIC=emd SPARENET_TRAIN_COMMUTE=1 python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/decomp_emd_commute.log
echo "=== [5/5] B=32 chamfer remat / commute ==="
B=32 METRIC=chamfer REMAT=1 python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/b32_remat.log
B=32 METRIC=chamfer SPARENET_TRAIN_COMMUTE=1 python scripts/r4/profile_train_decomp.py 2>&1 | tee $OUT/b32_commute.log
echo "STAGE2B DONE"
