"""Seed-variance quality report.

BASELINE.md defines parity statistically (the reference's negative sampling
is unseeded), so quality must be reported as mean ± std over seeds. Runs
the full pipeline end-to-end at N seeds on a shared dataset and prints the
aggregate table.

Usage:
  JAX_PLATFORMS=cpu python scripts/seed_variance.py --seeds 3 \
      --data-dir /tmp/var/ml [--epochs 30]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--data-dir", default="/tmp/seedvar/ml")
    ap.add_argument("--work-dir", default="/tmp/seedvar")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--eval-users", type=int, default=150)
    args = ap.parse_args()

    from recommendit_tpu.config import Settings
    from recommendit_tpu.pipelines.run_pipeline import PipelineOrchestrator
    from recommendit_tpu.utils.logging import setup_logging

    setup_logging("WARNING")

    reports = []
    for seed in range(args.seeds):
        cfg = Settings(SEED=seed)
        if args.epochs:
            cfg = cfg.replace(TRAIN_EPOCHS=args.epochs)
        orch = PipelineOrchestrator(
            cfg=cfg,
            data_dir=args.data_dir,             # dataset shared across seeds
            models_dir=f"{args.work_dir}/models_s{seed}",
            features_dir=f"{args.work_dir}/features",
            synthetic=True,
            eval_users=args.eval_users,
        )
        # dataset + offline features are shared across seeds (built once);
        # only the seeded model training varies
        if seed == 0:
            orch.run_stage("data")
            orch.run_stage("features")
        for stage in ("embeddings", "index", "ranker"):
            orch.run_stage(stage)
        rep = orch.run_stage("evaluate")
        reports.append(rep)
        print(f"seed {seed}: ndcg@10={rep['ndcg@10']:.4f} "
              f"recall@20={rep['recall@20']:.4f} mrr={rep['mrr']:.4f}",
              flush=True)

    keys = ["ndcg@10", "recall@20", "mrr", "retrieval_only_ndcg@10",
            "popularity_ndcg@10"]
    agg = {}
    print("\n=== seed variance (n=%d) ===" % args.seeds)
    for k in keys:
        vals = np.array([r.get(k, np.nan) for r in reports], float)
        agg[k] = {"mean": float(np.nanmean(vals)),
                  "std": float(np.nanstd(vals))}
        print(f"{k:<26} {np.nanmean(vals):.4f} ± {np.nanstd(vals):.4f}")
    out = f"{args.work_dir}/seed_variance.json"
    with open(out, "w") as f:
        json.dump({"n_seeds": args.seeds, "metrics": agg,
                   "reports": reports}, f, indent=2, default=float)
    print(f"\nwritten → {out}")


if __name__ == "__main__":
    main()
