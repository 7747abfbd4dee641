#!/bin/bash
# Round-5 stage 1b: throughput of the MDS round-size SCHEDULES (the
# early-update batched variants added in round 5; quality side comes
# from envelope_multibatch.py's schedule rows).
set -uo pipefail
cd /root/repo
OUT=${OUT:-/tmp/r5_stage1}
mkdir -p $OUT

for S in "2048,4096" "4096" "2048" "1024,2048,4096"; do
  echo "--- schedule $S ---"
  SPARENET_MDS_SCHEDULE=$S python bench.py 2>/dev/null \
    | tee $OUT/bench_s$(echo $S | tr ',' '_').json
done
echo "STAGE1B DONE"
