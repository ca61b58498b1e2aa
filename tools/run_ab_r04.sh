#!/bin/bash
# Round-4 extended dense-vs-sparse quality A/B (VERDICT r03 next-#6):
# >=5k steps, 256 scenes, multi-seed, mAPH trajectories.
#
# The two arms run as separate invocations because their wall costs differ
# 13x (dense bf16 ~0.25 s/step vs sparse f32 ~3.9 s/step on one v5e chip):
# the dense (shipped flagship) arm gets the full 5000 steps x 2 seeds; the
# reference-topology sparse arm gets one seed under a wall budget, compared
# at matched step counts via the trajectories.
set -e
cd "$(dirname "$0")/.."
python tools/ab_dense_vs_sparse.py --steps 5000 --warmup 400 \
  --train-scenes 256 --val-scenes 24 --seeds 0,1 --eval-every 1000 \
  --builds dense --out AB_DENSE_r04.json
python tools/ab_dense_vs_sparse.py --steps 5000 --warmup 400 \
  --train-scenes 256 --val-scenes 24 --seeds 0 --eval-every 500 \
  --builds sparse --max-wall-s ${SPARSE_WALL_S:-3900} --out AB_SPARSE_r04.json
python - <<'EOF'
import json

dense = json.load(open("AB_DENSE_r04.json"))
sparse = json.load(open("AB_SPARSE_r04.json"))
keys = ("Overall/L1 mAP", "Overall/L1 mAPH",
        "Overall/L2 mAP", "Overall/L2 mAPH")
out = {"args_dense": dense["args"], "args_sparse": sparse["args"],
       "dense": dense["dense"], "sparse": sparse["sparse"],
       "delta_dense_minus_sparse": {
           k: round(dense["dense"]["ap"][k] - sparse["sparse"]["ap"][k], 4)
           for k in keys}}
# matched-step delta: compare arms at the largest step both reached
sp_traj = sparse["sparse"]["runs"][0]["trajectory"]
matched = None
for step, ap in reversed(sp_traj):
    d_at = [dict(t[1], step=t[0]) for r in dense["dense"]["runs"]
            for t in r["trajectory"] if t[0] == step]
    if d_at:
        matched = {"step": step,
                   "dense_mean_L1_mAPH": round(
                       sum(d["Overall/L1 mAPH"] for d in d_at) / len(d_at), 4),
                   "sparse_L1_mAPH": ap["Overall/L1 mAPH"]}
        break
out["matched_step_delta"] = matched
json.dump(out, open("AB_DENSE_SPARSE_r04.json", "w"), indent=1)
print("merged ->", "AB_DENSE_SPARSE_r04.json")
print(json.dumps(out["delta_dense_minus_sparse"]))
EOF
