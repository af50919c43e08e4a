"""Ranker-config A/B at catalog scale over an existing quality_at_scale
work-dir: retrain ONLY the ranker stage under `--cfg` overrides (tower,
index, features are reused), then evaluate across a small serving-fusion
sweep. Each variant's ranker is saved under its own name so variants can
be re-evaluated later without retraining.

Round-4 goal (VERDICT #2): full pipeline beating retrieval-only NDCG@10
outside seed noise at 40k x 62k x 12M.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--work-dir", default="/tmp/qscale")
    ap.add_argument("--users", type=int, default=40000)
    ap.add_argument("--items", type=int, default=62423)
    ap.add_argument("--eval-users", type=int, default=2000)
    ap.add_argument("--betas", default="1,2")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cfg", action="append", default=[])
    ap.add_argument("--log", default="/tmp/qscale/ranker_ab.jsonl")
    args = ap.parse_args()

    from recommendit_tpu.config import Settings
    from recommendit_tpu.pipelines.run_pipeline import PipelineOrchestrator
    from recommendit_tpu.utils.logging import setup_logging

    setup_logging("INFO")
    ranker_path = f"{args.work_dir}/models/ranker_{args.name}.npz"
    cfg = Settings(
        SEED=args.seed, HOST_TABLE=True, TRAIN_EPOCHS=5,
        SYNTH_USERS=args.users, SYNTH_ITEMS=args.items,
        RANKER_MODEL_PATH=ranker_path,
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
        respect_cfg_paths=True,  # keep the per-variant ranker path
    )
    t0 = time.time()
    trainer = orch.run_stage("ranker")
    train_s = time.time() - t0
    holdout = dict(getattr(trainer, "holdout_metrics", {}) or {})

    rows = []
    for beta in [float(b) for b in args.betas.split(",")]:
        # mutate the ORCHESTRATOR's cfg (it holds the models_dir-remapped
        # artifact paths; rebuilding from the raw cfg would point the
        # evaluate stage at non-existent relative paths)
        orch.cfg = orch.cfg.replace(RANKER_BLEND_RETRIEVAL=beta)
        rep = orch.run_stage("evaluate")
        rows.append({
            "beta": beta,
            "full_ndcg@10": rep.get("ndcg@10"),
            "full_recall@20": rep.get("recall@20"),
            "full_mrr": rep.get("mrr"),
            "retrieval_only_ndcg@10": rep.get("retrieval_only_ndcg@10"),
            "retrieval_only_recall@20": rep.get("retrieval_only_recall@20"),
            "paired_diff": rep.get("paired_ndcg10_full_minus_retrieval"),
            "paired_t": rep.get("paired_ndcg10_t"),
            "retrieval_only_mrr": rep.get("retrieval_only_mrr"),
        })
        print(json.dumps(rows[-1]), flush=True)

    result = {
        "name": args.name, "seed": args.seed,
        "cfg": dict(kv.split("=", 1) for kv in args.cfg),
        "ranker_train_s": round(train_s, 1),
        "inner_holdout": holdout,
        "serving": rows,
        "eval_users": args.eval_users,
    }
    with open(args.log, "a") as f:
        f.write(json.dumps(result, default=float) + "\n")
    print(json.dumps(result, indent=2, default=float))


if __name__ == "__main__":
    main()
