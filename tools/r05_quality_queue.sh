#!/bin/bash
# Round-5 quality-evidence queue (single TPU chip, strictly sequential).
#
# 1. Sparse reference-topology arm, seed 0, to >=2000 matched steps
#    (VERDICT r04 next-#1): same 5000-step cosine schedule / 256 scenes /
#    warmup 400 as the dense r04 trajectories, eval every 500 so
#    matched-step deltas at 1000/1500/2000 exist. Wall-capped + resumable;
#    the retry loop survives remote-backend stalls (r04's failure mode).
# 2. dense_f32 arms, seeds 0+1, fully matched to the r04 dense(bf16) runs
#    (ADVICE r04 #2: the bf16-default quality claim needs a matched f32
#    ablation).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r05_queue.log
echo "=== r05 quality queue start $(date)" >> "$LOG"

for i in 1 2 3 4; do
  timeout 12600 python tools/ab_dense_vs_sparse.py \
    --builds sparse --seeds 0 --steps 5000 --warmup 400 \
    --train-scenes 256 --val-scenes 24 --eval-every 500 \
    --ckpt-every 250 --resume --max-wall-s 11700 \
    --out AB_SPARSE_r05.json >> "$LOG" 2>&1
  rc=$?
  echo "=== sparse attempt $i rc=$rc $(date)" >> "$LOG"
  # rc=0 with a wall-cap stop still means "checkpointed, more steps to go";
  # stop retrying once the checkpoint has reached >=2300 steps or completed
  steps_done=$(python - <<'EOF'
import json, os
p = "/tmp/sst_ab_ckpt/sparse/progress.json"
print(json.load(open(p))["step"] if os.path.exists(p) else 0)
EOF
)
  echo "=== sparse steps_done=$steps_done" >> "$LOG"
  if [ "$steps_done" -ge 2300 ]; then break; fi
done

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
echo "=== r05 quality queue done $(date)" >> "$LOG"
