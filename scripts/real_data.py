"""Turnkey real-data parity run (`make real-data`).

Runs the FULL real-data code path end-to-end: download → parse →
features → embeddings → index → ranker → temporal evaluate → parity
report vs the reference's published MovieLens-1M ladder
(/root/reference/README.md:34-38). When the download is blocked (this
environment's egress failure is DNS resolution: `getaddrinfo` returns
EAI_NONAME — "Name or service not known"), it falls back to the golden
ML-1M-format fixture (tests/fixtures/ml1m_golden — real file quirks:
latin-1 titles, non-contiguous ids, ZIP+4 codes) so every byte of the
real-data path still executes; the report is then marked
``"mode": "golden-fixture"`` and the quality rows are NOT comparable.
The first unblocked run is literally `make real-data`.
"""
import argparse
import json
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# reference ladder, README.md:34-38 (popularity / retrieval-only / full)
REFERENCE_TARGETS = {
    "ndcg@10": [0.041, 0.089, 0.143],
    "recall@20": [0.089, 0.201, 0.312],
    "mrr": [0.052, 0.112, 0.178],
}

GOLDEN = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "ml1m_golden"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="data/ml-1m")
    ap.add_argument("--models-dir", default="models/real")
    ap.add_argument("--features-dir", default="data/features-real")
    ap.add_argument("--eval-users", type=int, default=2000)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--out", default="REALDATA.json")
    ap.add_argument("--cfg", action="append", default=[])
    args = ap.parse_args()

    from recommendit_tpu.config import Settings
    from recommendit_tpu.data.movielens import (
        download_movielens,
        verify_dataset,
    )
    from recommendit_tpu.pipelines.run_pipeline import PipelineOrchestrator
    from recommendit_tpu.utils.logging import setup_logging

    setup_logging("INFO")
    data_dir = Path(args.data_dir)
    mode = "real"
    if verify_dataset(data_dir):
        print(f"dataset present at {data_dir}")
    else:
        try:
            download_movielens(str(data_dir.parent))
        except RuntimeError as exc:
            print(f"download blocked ({exc}); falling back to the golden "
                  f"ml-1m-format fixture at {GOLDEN}")
            mode = "golden-fixture"
            data_dir.mkdir(parents=True, exist_ok=True)
            for f in ("ratings.dat", "users.dat", "movies.dat", "README"):
                shutil.copy(GOLDEN / f, data_dir / f)
    assert verify_dataset(data_dir), "dataset incomplete after setup"

    cfg = Settings(TRAIN_EPOCHS=args.epochs)
    if mode == "golden-fixture":
        # fixture is 30 users x 21 movies — shrink knobs so every stage
        # still runs (candidates-mode ranker falls back to pairs there)
        cfg = cfg.replace(TRAIN_EPOCHS=2, TOP_K_CANDIDATES=10,
                          RANKER_EPOCHS=4, RANKER_LABEL_FRACTION=0.3,
                          RANKER_CAND_FOLDS=1)
    for kv in args.cfg:
        k, v = kv.split("=", 1)
        cur = getattr(cfg, k)
        cfg = cfg.replace(**{k: (v.lower() in ("1", "true"))
                             if isinstance(cur, bool) else type(cur)(v)})

    orch = PipelineOrchestrator(
        cfg=cfg, data_dir=str(data_dir), models_dir=args.models_dir,
        features_dir=args.features_dir, synthetic=False,
        eval_users=args.eval_users,
    )
    for stage in ("features", "embeddings", "index", "ranker"):
        orch.run_stage(stage)
    rep = orch.run_stage("evaluate")

    ladder = {
        "popularity": [rep.get("popularity_ndcg@10"),
                       rep.get("popularity_recall@20"),
                       rep.get("popularity_mrr")],
        "retrieval_only": [rep.get("retrieval_only_ndcg@10"),
                           rep.get("retrieval_only_recall@20"),
                           rep.get("retrieval_only_mrr")],
        "full": [rep.get("ndcg@10"), rep.get("recall@20"), rep.get("mrr")],
    }
    report = {
        "mode": mode,
        "comparable_to_reference": mode == "real",
        "reference_targets_ndcg10_recall20_mrr": REFERENCE_TARGETS,
        "measured_ladder_ndcg10_recall20_mrr": {
            k: [None if v is None else round(float(v), 4) for v in vals]
            for k, vals in ladder.items()
        },
        "eval_users": rep.get("n_users"),
        "stage_seconds": {k: round(v, 1)
                          for k, v in orch.stage_times.items()},
        "blocked_syscall": None if mode == "real" else (
            "urllib urlopen -> getaddrinfo(files.grouplens.org) -> "
            "EAI_NONAME (Errno -2, 'Name or service not known'): DNS "
            "resolution denied, zero egress"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    if mode == "golden-fixture":
        print("NOTE: golden-fixture mode — quality rows are NOT comparable "
              "to the reference ladder; re-run with network access for the "
              "real parity report.")


if __name__ == "__main__":
    main()
