#!/bin/bash
# Round-5 stage 2 (after the sparse matched-step arm): single-chip queue.
#   1. wait for the in-flight sparse A/B python to release the TPU claim
#   2. merge matched-step deltas -> AB_DENSE_SPARSE_r05.json (VERDICT #1)
#   3. bench at HEAD -> BENCH_r05_local.json (first hardware pass over the
#      round-5 windowed rulebook sparse conv + fsdpp_dense)
#   4. dense_f32 dtype-ablation arms, seeds 0+1 (ADVICE r04 #2), resumable
#   5. stretch: sparse seed 1 to >=2000 matched steps
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r05_stage2.log
WAIT_PID="${1:-0}"
echo "=== r05 stage2 start $(date) waiting on pid $WAIT_PID" >> "$LOG"

if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
sleep 30   # let the axon claim fully release
echo "=== chip free $(date)" >> "$LOG"

python tools/ab_merge.py --out AB_DENSE_SPARSE_r05.json \
  --pair dense:sparse AB_DENSE_r04.json AB_SPARSE_r05.json >> "$LOG" 2>&1
echo "=== merge rc=$? $(date)" >> "$LOG"

timeout 3000 python bench.py > BENCH_r05_local.json 2>> "$LOG"
echo "=== bench rc=$? $(date)" >> "$LOG"

for i in 1 2 3; do
  timeout 9000 python tools/ab_dense_vs_sparse.py \
    --builds dense_f32 --seeds 0,1 --steps 5000 --warmup 400 \
    --train-scenes 256 --val-scenes 24 --eval-every 1000 \
    --ckpt-every 500 --resume --max-wall-s 8400 \
    --out AB_DENSE_F32_r05.json >> "$LOG" 2>&1
  rc=$?
  echo "=== dense_f32 attempt $i rc=$rc $(date)" >> "$LOG"
  done_flag=$(python - <<'EOF'
import json, os
ok = 0
try:
    d = json.load(open("AB_DENSE_F32_r05.json"))
    runs = d.get("dense_f32", {}).get("runs", [])
    ok = int(len(runs) >= 2 and all(
        "stopped_early_at_step" not in r for r in runs))
except Exception:
    pass
print(ok)
EOF
)
  if [ "$done_flag" = "1" ]; then break; fi
done

python tools/ab_merge.py --out AB_DENSE_SPARSE_r05.json \
  --pair dense:sparse --pair dense:dense_f32 \
  AB_DENSE_r04.json AB_SPARSE_r05.json AB_DENSE_F32_r05.json >> "$LOG" 2>&1
echo "=== merge2 rc=$? $(date)" >> "$LOG"

# stretch: second sparse seed to >=2000 matched steps (fresh ckpt dir —
# the single-seed tag is just "sparse" and would collide with seed 0's
# fingerprint under the default --ckpt-dir)
for i in 1 2; do
  timeout 8000 python tools/ab_dense_vs_sparse.py \
    --builds sparse --seeds 1 --steps 5000 --warmup 400 \
    --train-scenes 256 --val-scenes 24 --eval-every 500 \
    --ckpt-every 250 --resume --ckpt-dir /tmp/sst_ab_ckpt_s1 \
    --max-wall-s 7500 \
    --out AB_SPARSE_S1_r05.json >> "$LOG" 2>&1
  echo "=== sparse-s1 attempt $i rc=$? $(date)" >> "$LOG"
  steps_done=$(python - <<'EOF'
import json, os
p = "/tmp/sst_ab_ckpt_s1/sparse/progress.json"
print(json.load(open(p))["step"] if os.path.exists(p) else 0)
EOF
)
  if [ "$steps_done" -ge 2000 ]; then break; fi
done
python tools/ab_merge.py --out AB_DENSE_SPARSE_r05.json \
  --pair dense:sparse --pair dense:dense_f32 \
  AB_DENSE_r04.json AB_SPARSE_r05.json AB_SPARSE_S1_r05.json \
  AB_DENSE_F32_r05.json >> "$LOG" 2>&1
echo "=== merge3 rc=$? $(date)" >> "$LOG"
echo "=== r05 stage2 done $(date)" >> "$LOG"
