#!/bin/bash
# Round-5 device chain, stage 6: resolve the train-commute red gate
# (VERDICT r4 task #2) and move the training step (task #3).
#
# Precondition: scripts/r5/diag_commute.py (stage-2 chain) attributed
# the round-4 COMMUTE_HW FAIL. If the verdict was GRAPH-FLIP CASCADE
# (kernels exact; the 6.1e-2 free-running dev is discrete kNN near-tie
# flips cascading through stages 2-4 — the same class of divergence the
# reference's external knn_cuda wheel exhibits vs any exact kNN), the
# correct acceptance test is SEMANTIC equivalence, not free-running
# bitwise parity:
#   1. a short training-convergence A/B from identical init: dense vs
#      pallas-commute, same data order — loss trajectories + end-state
#      val CD must track within the seed-to-seed envelope;
#   2. bench_train at the candidate modes: dense parity, commute,
#      serving-aligned, commute+aligned (the <=650 ms target).
set -uo pipefail
cd /root/repo
OUT=${OUT:-/tmp/r5_stage6}
STEPS=${STEPS:-150}
mkdir -p $OUT

echo "=== [1/2] convergence A/B: dense vs pallas-commute ($STEPS steps) ==="
python scripts/r5/commute_converge_ab.py --steps "$STEPS" \
    2>&1 | tee $OUT/commute_converge_ab.log | tail -40

echo "=== [2/2] bench_train at the candidate modes (B=24 chamfer) ==="
B=24 METRIC=chamfer SPARENET_TRAIN_COMMUTE=pallas \
    python scripts/bench_train.py 2>&1 | tee $OUT/bench_train_commute.log
B=24 METRIC=chamfer SPARENET_TRAIN_COMMUTE=pallas SERVING_ALIGNED=1 \
    python scripts/bench_train.py 2>&1 | tee $OUT/bench_train_commute_aligned.log

echo "STAGE6 DONE"
