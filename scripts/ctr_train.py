"""Criteo-style CTR config driver (BASELINE config #5).

Generates a seeded synthetic Criteo-shaped impression log, trains the
DLRM-style CTR model — by default jointly with the retrieval towers that
share its stacked embedding table (end-to-end two-stage) — and reports
AUC / logloss / retrieval Recall@K plus training throughput.

Usage:
    PYTHONPATH=. python scripts/ctr_train.py [--examples N] [--epochs E]
        [--no-joint] [--users U] [--items I] [--save PATH]
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from recommendit_tpu.config import settings
from recommendit_tpu.data.ctr import make_ctr_dataset
from recommendit_tpu.training.train_ctr import CTRTrainer


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--examples", type=int, default=500_000)
    ap.add_argument("--users", type=int, default=20_000)
    ap.add_argument("--items", type=int, default=5_000)
    ap.add_argument("--epochs", type=int, default=settings.CTR_EPOCHS)
    ap.add_argument("--batch-size", type=int, default=settings.CTR_BATCH_SIZE)
    ap.add_argument("--no-joint", action="store_true",
                    help="plain CTR (no retrieval towers / softmax term)")
    ap.add_argument("--seed", type=int, default=settings.SEED)
    ap.add_argument("--save", type=str, default=None,
                    help="checkpoint path (npz) for the trained model")
    args = ap.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    log = logging.getLogger("ctr_train")

    log.info("Generating %d impressions (%d users x %d items)...",
             args.examples, args.users, args.items)
    data = make_ctr_dataset(
        n_examples=args.examples, n_users=args.users, n_items=args.items,
        seed=args.seed,
    )
    cfg = settings.replace(
        CTR_EPOCHS=args.epochs, CTR_BATCH_SIZE=args.batch_size,
        SEED=args.seed,
    )
    trainer = CTRTrainer(
        data, cfg=cfg, joint=not args.no_joint,
        model_output_path=args.save,
    )
    trainer.train()
    report = trainer.evaluate()
    report["examples_per_s"] = round(trainer.examples_per_s)
    report["joint"] = not args.no_joint
    print(json.dumps(report))


if __name__ == "__main__":
    main()
