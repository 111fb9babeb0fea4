"""Assemble QUALITY_r05.json from the round-5 campaign artifacts.

Inputs (produced by scripts/run_quality_r5.sh):
  QUALITY_r05_seed{0,1,2}.json   r4 protocol at three seeds
  QUALITY_r05_clusters.json      cluster hard-negative curriculum leg
  QUALITY_r05_ssl.json           visual-SSL leg

Output: one QUALITY_r05.json with
  * per-seed numbers,
  * mean +- sample std for retrieval r_mean and zero-shot top-1 at every
    swept checkpoint (the r4 regression question: is 18.9 -> 15.8 within
    seed noise?),
  * the curriculum / SSL legs vs the seed-0 baseline at equal budget.
"""

from __future__ import annotations

import json
import math
import os
import sys


def load(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def mean_std(xs):
    xs = [x for x in xs if x is not None]
    if not xs:
        return None
    mu = sum(xs) / len(xs)
    if len(xs) < 2:
        return {"mean": round(mu, 3), "std": None, "n": 1}
    var = sum((x - mu) ** 2 for x in xs) / (len(xs) - 1)
    return {"mean": round(mu, 3), "std": round(math.sqrt(var), 3),
            "n": len(xs)}


def main(out_path="QUALITY_r05.json"):
    seeds = {s: load(f"QUALITY_r05_seed{s}.json") for s in (0, 1, 2)}
    clusters = load("QUALITY_r05_clusters.json")
    ssl = load("QUALITY_r05_ssl.json")

    out = {"protocol": "r4 campaign (10k iters, fs_tpu_tuned semantics, "
                       "synthetic learnable corpus) at seeds 0/1/2 + "
                       "curriculum and visual-SSL legs",
           "seeds": {}, "spread": {}, "legs": {}}

    steps = set()
    for s, q in seeds.items():
        if q:
            out["seeds"][str(s)] = q.get("checkpoints", {})
            if "final" in q and q["final"]:
                out["seeds"][str(s) + "_final"] = q["final"]
            steps.update(q.get("checkpoints", {}).keys())

    for step in sorted(steps, key=int):
        def metric(path):
            vals = []
            for q in seeds.values():
                node = (q or {}).get("checkpoints", {}).get(step, {})
                for k in path:
                    node = node.get(k) if isinstance(node, dict) else None
                    if node is None:
                        break
                vals.append(node)
            return mean_std(vals)

        out["spread"][step] = {
            "retrieval_r_mean": metric(["retrieval", "r_mean"]),
            "zero_shot_top1": metric(["zero_shot", "zero_shot_top1"]),
        }

    # Regression verdict: r3=18.9 / r4=15.8 zero-shot vs this spread.
    final = out["spread"].get("10000", {}).get("zero_shot_top1")
    if final and final.get("std"):
        lo = final["mean"] - 2 * final["std"]
        hi = final["mean"] + 2 * final["std"]
        out["regression_analysis"] = {
            "r3_zero_shot": 18.9, "r4_zero_shot": 15.8,
            "r5_mean": final["mean"], "r5_std": final["std"],
            "r5_2sigma_interval": [round(lo, 2), round(hi, 2)],
            "r3_within_2sigma": bool(lo <= 18.9 <= hi),
            "r4_within_2sigma": bool(lo <= 15.8 <= hi),
        }

    if clusters:
        out["legs"]["clusters"] = dict(clusters)
        out["legs"]["clusters"].setdefault(
            "note", "seed-0 run resumed at 7500 into the clustered "
                    "hard-negative phase (reference train.py:151-163)")
    if ssl:
        out["legs"]["visual_ssl"] = {
            "checkpoints": ssl.get("checkpoints", {}),
            "note": "MODEL.VISUAL.SELF_SUPERVISED with the on-device "
                    "aug view from DeviceDataCache (ssl_aug)",
        }

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out.get("spread", {}), indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
