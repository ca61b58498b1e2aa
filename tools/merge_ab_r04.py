"""Merge the round-4 A/B runs into AB_DENSE_SPARSE_r04.json.

Arms (same 256 full-cap scenes, same 24 held-out scenes, same schedules):
  AB_DENSE_r04.json    — shipped bf16 dense flagship, seeds {0,1} x 5000 steps
  AB_SPARSE_r04.json   — f32 sparse reference topology, seed 0, wall-capped
  AB_SPARSE1K_r04.json — same sparse build, exact 1000 steps (matched-step
                         point: both arms then have 400 seg-warmup + 600
                         detection steps)
"""

import json
import os

keys = ("Overall/L1 mAP", "Overall/L1 mAPH",
        "Overall/L2 mAP", "Overall/L2 mAPH")
out = {}
dense = json.load(open("AB_DENSE_r04.json"))
out["args_dense"] = dense["args"]
out["dense"] = dense["dense"]
sparse_wall = json.load(open("AB_SPARSE_r04.json"))
out["sparse_wallcap"] = sparse_wall["sparse"]
if os.path.exists("AB_SPARSE1K_r04.json"):
    s1k = json.load(open("AB_SPARSE1K_r04.json"))
    out["sparse_1000"] = s1k["sparse"]
    out["args_sparse_1000"] = s1k["args"]
    sparse_final_step = s1k["sparse"]["runs"][0]["trajectory"][-1][0]
    d_at_1000 = [t[1] for r in dense["dense"]["runs"]
                 for t in r["trajectory"] if t[0] == 1000]
    out["matched_1000_step_delta"] = {
        # dense measured at exactly step 1000; sparse at its actual final
        # step (1000, or slightly earlier if the wall budget intervened) —
        # recorded explicitly so the comparison stays honest
        "dense_step": 1000,
        "sparse_step": sparse_final_step,
        "dense_mean_L1_mAP": round(
            sum(d["Overall/L1 mAP"] for d in d_at_1000) / len(d_at_1000), 4),
        "dense_mean_L1_mAPH": round(
            sum(d["Overall/L1 mAPH"] for d in d_at_1000) / len(d_at_1000), 4),
        "dense_per_seed_L1_mAP": [d["Overall/L1 mAP"] for d in d_at_1000],
        "sparse_L1_mAP": s1k["sparse"]["ap"]["Overall/L1 mAP"],
        "sparse_L1_mAPH": s1k["sparse"]["ap"]["Overall/L1 mAPH"],
    }
out["delta_dense5k_minus_sparse_best"] = {
    k: round(out["dense"]["ap"][k]
             - max(out.get("sparse_1000", {"ap": {k: -1}})["ap"][k],
                   out["sparse_wallcap"]["ap"][k]), 4)
    for k in keys}
json.dump(out, open("AB_DENSE_SPARSE_r04.json", "w"), indent=1)
print(json.dumps({k: v for k, v in out.items()
                  if k.startswith(("matched", "delta"))}, indent=1))
