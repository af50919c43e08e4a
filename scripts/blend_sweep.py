"""Serving-fusion (RANKER_BLEND_RETRIEVAL) sweep over EXISTING artifacts.

The fusion weight is applied at serving-pipeline build time
(serving/recommender.py:269), so sweeping it needs no retraining — this
reuses a quality_at_scale work-dir (tower/index/ranker/features) and
re-runs only the evaluate stage per beta. Used to locate the fusion
optimum at catalog scale (VERDICT round-3 weak spot: +2% NDCG@10 at
40k x 62k x 12M).
"""
import argparse
import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/qscale")
    ap.add_argument("--betas", default="0,0.5,1,2,4")
    ap.add_argument("--eval-users", type=int, default=2000)
    ap.add_argument("--users", type=int, default=40000)
    ap.add_argument("--items", type=int, default=62423)
    ap.add_argument("--out", default="/tmp/qscale/blend_sweep.json")
    ap.add_argument("--cfg", action="append", default=[])
    args = ap.parse_args()

    from recommendit_tpu.config import Settings
    from recommendit_tpu.pipelines.run_pipeline import PipelineOrchestrator
    from recommendit_tpu.utils.logging import setup_logging

    setup_logging("WARNING")
    rows = []
    for beta in [float(b) for b in args.betas.split(",")]:
        cfg = Settings(
            SEED=0, HOST_TABLE=True,
            SYNTH_USERS=args.users, SYNTH_ITEMS=args.items,
            RANKER_BLEND_RETRIEVAL=beta,
        )
        for kv in args.cfg:
            k, v = kv.split("=", 1)
            cur = getattr(cfg, k)
            cfg = cfg.replace(**{k: (v.lower() in ("1", "true"))
                                 if isinstance(cur, bool) else type(cur)(v)})
        orch = PipelineOrchestrator(
            cfg=cfg, data_dir=f"{args.work_dir}/ml",
            models_dir=f"{args.work_dir}/models",
            features_dir=f"{args.work_dir}/features",
            synthetic=False, eval_users=args.eval_users,
        )
        rep = orch.run_stage("evaluate")
        row = {
            "beta": beta,
            "full_ndcg@10": rep.get("ndcg@10"),
            "full_recall@20": rep.get("recall@20"),
            "full_mrr": rep.get("mrr"),
            "retrieval_only_ndcg@10": rep.get("retrieval_only_ndcg@10"),
            "retrieval_only_recall@20": rep.get("retrieval_only_recall@20"),
            "paired_diff": rep.get("paired_ndcg10_full_minus_retrieval"),
            "paired_t": rep.get("paired_ndcg10_t"),
            "n_eval_users": rep.get("n_users"),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2, default=float)


if __name__ == "__main__":
    main()
