#!/bin/bash
# Round-5 device chain, stage 4b: the SORT selection arm on chip.
# Stage 4 measured the bisect arm's searchsorted compaction at ~98 ms
# (per-query dynamic gathers — the round-1 pathological-lowering class),
# 7x WORSE than the top_k it replaced. The sort arm replaces the whole
# selection with ONE stable variadic lax.sort of the density bit
# patterns (flat in take, no gathers); CPU tests prove it elementwise-
# identical to stable top_k. Here: on-chip parity, per-config cost,
# bench at the candidate headline configs.
set -uo pipefail
cd /root/repo
OUT=${OUT:-/tmp/r5_stage4b}
mkdir -p $OUT

echo "=== [1/3] on-chip elementwise parity (sort vs topk) ==="
python - <<'EOF' 2>&1 | tee $OUT/sort_parity.log
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
    a = np.asarray(_mds_batched(x, 16384, mml, select="sort", **kw))
    b = np.asarray(_mds_batched(x, 16384, mml, select="topk", **kw))
    same_set = all(set(a[i].tolist()) == set(b[i].tolist())
                   for i in range(8))
    print(f"{kw}: set-equal {same_set}", flush=True)
    ok &= same_set
print("SORT_PARITY " + ("PASS" if ok else "FAIL"), flush=True)
EOF

echo "=== [2/3] per-config MDS cost (sort arm) + piece budget ==="
SPARENET_MDS_SELECT=sort python scripts/r5/profile_mds_configs.py \
    2>&1 | tee $OUT/mds_configs_sort.log
python scripts/r5/profile_mds_pieces.py 2>&1 | tee $OUT/mds_pieces.log

echo "=== [3/3] bench at candidate configs (sort arm) ==="
for CFG in "S4096_pack16:SPARENET_MDS_SCHEDULE=4096 SPARENET_MDS_SELECT=pack16" \
           "S2048_pack16:SPARENET_MDS_SCHEDULE=2048 SPARENET_MDS_SELECT=pack16" \
           "G8192_pack16:SPARENET_MDS_SELECT=pack16"; do
  NAME="${CFG%%:*}"; ENVV="${CFG#*:}"
  echo "--- $NAME ---"
  env $ENVV python bench.py 2>/dev/null | tee $OUT/bench_sort_$NAME.json
done
echo "STAGE4B DONE"
