#!/bin/bash
# Round-5 device chain, stage 4: the bisect round-selection on chip.
#   1. set-parity bisect vs topk at the production shape (on HW),
#   2. per-config MDS cost with bisect,
#   3. bench.py at the candidate headline configs.
set -uo pipefail
cd /root/repo
OUT=${OUT:-/tmp/r5_stage4}
mkdir -p $OUT

echo "=== [1/3] on-chip set parity (bisect vs topk) ==="
python - <<'EOF' 2>&1 | tee $OUT/bisect_parity.log
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from sparenet_tpu.ops.mds import _mds_batched

rs = np.random.RandomState(0)
x = jnp.asarray(rs.rand(8, 19456, 3).astype(np.float32) - 0.5)
mml = jnp.full((8,), 0.12, jnp.float32)
ok = True
for kw in (dict(g=8192), dict(g=8192, schedule=(4096,)),
           dict(g=4096), dict(g=8192, schedule=(1024, 2048, 4096))):
    a = np.asarray(_mds_batched(x, 16384, mml, select="bisect", **kw))
    b = np.asarray(_mds_batched(x, 16384, mml, select="topk", **kw))
    same = all(set(a[i].tolist()) == set(b[i].tolist()) for i in range(8))
    print(f"{kw}: set-equal {same}", flush=True)
    ok &= same
print("BISECT_PARITY " + ("PASS" if ok else "FAIL"), flush=True)
EOF

echo "=== [2/3] per-config MDS cost (bisect default) ==="
python scripts/r5/profile_mds_configs.py 2>&1 | tee $OUT/mds_configs_bisect.log

echo "=== [3/3] bench at candidate configs ==="
for CFG in "G8192:" "S4096:SPARENET_MDS_SCHEDULE=4096" \
           "G4096:SPARENET_MDS_BATCH_G=4096" \
           "S1k2k4k:SPARENET_MDS_SCHEDULE=1024,2048,4096" \
           "G6144:SPARENET_MDS_BATCH_G=6144"; do
  NAME="${CFG%%:*}"; ENVV="${CFG#*:}"
  echo "--- $NAME ---"
  env $ENVV python bench.py 2>/dev/null | tee $OUT/bench_bisect_$NAME.json
done
echo "STAGE4 DONE"
