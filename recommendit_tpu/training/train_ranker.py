"""Ranker training stage.

Parity with the reference ``RankerTrainer`` (``src/training/train_ranker.py``):
load-or-compute features (:62-73), build query-grouped pairs (:76-79),
interaction features (:82-86), train with a validation set (:112-125),
holdout per-query NDCG@10/20 + Recall@20 (:139-175), save + top-10 feature
importance log (:131-135).
"""
from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np
import pandas as pd

from recommendit_tpu.config import Settings, settings as default_settings
from recommendit_tpu.data.movielens import MovieLensData
from recommendit_tpu.evaluation.metrics import ndcg_at_k, recall_at_k
from recommendit_tpu.features.engineering import FeatureEngineer
from recommendit_tpu.features.schema import feature_columns
from recommendit_tpu.models.ranker import LambdaRankScorer

logger = logging.getLogger(__name__)


class RankerTrainer:
    def __init__(
        self,
        data: MovieLensData,
        cfg: Optional[Settings] = None,
        feature_engineer: Optional[FeatureEngineer] = None,
        ranker_output_path: Optional[str] = None,
        features_dir: Optional[str] = None,
    ):
        self.cfg = cfg or default_settings
        self.data = data
        self.fe = feature_engineer
        self.ranker_output_path = ranker_output_path or self.cfg.RANKER_MODEL_PATH
        self.features_dir = features_dir
        self.holdout_metrics: Dict[str, float] = {}

    def run(self) -> LambdaRankScorer:
        cfg = self.cfg
        fe = self.fe
        if fe is None:
            fe = FeatureEngineer(seed=cfg.SEED)
            fe.set_data(self.data)
        if fe.user_features is None or fe.item_features is None:
            if self.features_dir:
                fe.load_features(self.features_dir)
            if fe.user_features is None or fe.item_features is None:
                fe.build_user_features()
                fe.build_item_features()

        train_pairs, test_pairs = fe.build_training_pairs(
            n_negatives=cfg.N_NEGATIVES, seed=cfg.SEED
        )
        if cfg.RANKER_HARD_NEG_FRAC > 0.0:
            train_pairs = self._mine_hard_negatives(train_pairs)
        train_feats = fe.build_interaction_features(train_pairs)
        test_feats = fe.build_interaction_features(test_pairs)

        cols = feature_columns()
        if cfg.RANKER_USE_RETRIEVAL_SCORE:
            tower_cols = self._add_retrieval_score(train_feats, test_feats)
            cols = cols + tower_cols
        for df in (train_feats, test_feats):
            df.sort_values("query_id", inplace=True)
            df.dropna(subset=cols, inplace=True)

        # split train into train/valid by query for early stopping
        queries = train_feats["query_id"].unique()
        rng = np.random.default_rng(cfg.SEED)
        rng.shuffle(queries)
        n_valid = max(1, len(queries) // 10)
        valid_q = set(queries[:n_valid])
        valid_df = train_feats[train_feats["query_id"].isin(valid_q)]
        fit_df = train_feats[~train_feats["query_id"].isin(valid_q)]

        if cfg.RANKER_TYPE == "gbdt":
            from recommendit_tpu.models.gbdt import HistGBDTRanker

            ranker = HistGBDTRanker(
                n_estimators=cfg.GBDT_N_ESTIMATORS,
                learning_rate=cfg.GBDT_LEARNING_RATE,
                max_depth=cfg.GBDT_MAX_DEPTH,
                n_bins=cfg.GBDT_N_BINS,
                label_gain=cfg.RANKER_LABEL_GAIN,
                early_stop_rounds=max(10, cfg.RANKER_EARLY_STOP_ROUNDS * 4),
                seed=cfg.SEED,
            )
        else:
            ranker = LambdaRankScorer(
                hidden_dims=cfg.RANKER_HIDDEN_DIMS,
                learning_rate=cfg.RANKER_LEARNING_RATE,
                epochs=cfg.RANKER_EPOCHS,
                group_size=cfg.RANKER_GROUP_SIZE,
                label_gain=cfg.RANKER_LABEL_GAIN,
                eval_at=cfg.RANKER_EVAL_AT,
                early_stop_rounds=cfg.RANKER_EARLY_STOP_ROUNDS,
                seed=cfg.SEED,
                loss_type=cfg.RANKER_LOSS_TYPE,
                query_norm=cfg.RANKER_QUERY_NORM,
            )
        ranker.train(fit_df, cols, valid_df=valid_df)

        self.holdout_metrics = self._evaluate_holdout(ranker, test_feats, cols)
        logger.info("Holdout: %s", self.holdout_metrics)

        ranker.save(self.ranker_output_path)
        for feat, imp in ranker.top_features(10):
            logger.info("importance | %-28s %.5f", feat, imp)
        return ranker

    def _load_tower_embeddings(self):
        """(model, user_embs (n_users+1, D), item_embs (n_items, D)) from
        the trained two-tower checkpoint, or None if absent. Cached — the
        hard-negative miner and the retrieval_score feature share it."""
        if getattr(self, "_tower_cache", None) is not None:
            return self._tower_cache
        from pathlib import Path

        from recommendit_tpu.models.two_tower import TwoTowerModel
        from recommendit_tpu.training.train_embeddings import build_genre_table

        path = self.cfg.EMBEDDING_MODEL_PATH
        if not Path(path).exists():
            return None
        model = TwoTowerModel.load(path)
        genre_table = build_genre_table(self.data.movies, model.n_items)
        item_ids = np.arange(1, model.n_items + 1, dtype=np.int64)
        item_embs = model.get_item_embeddings(item_ids, genre_table[1:])
        # fold the learned popularity bias into an augmented column so the
        # plain dot products below score exactly like the serving MIPS index
        # ([emb, T·b] · [user, 1] = cos + T·b)
        bias = self.cfg.SOFTMAX_TEMPERATURE * model.item_bias_np(item_ids)
        item_embs = np.concatenate([item_embs, bias[:, None]], axis=1)
        import jax.numpy as jnp

        all_uids = np.arange(0, model.n_users + 1, dtype=np.int64)
        user_embs = np.asarray(
            model._jit_user(model.params, jnp.asarray(all_uids))
        )
        user_embs = np.concatenate(
            [user_embs, np.ones((len(user_embs), 1), user_embs.dtype)], axis=1
        )
        self._tower_cache = (model, user_embs, item_embs)
        return self._tower_cache

    def _mine_hard_negatives(self, pairs: pd.DataFrame) -> pd.DataFrame:
        """Replace a fraction of each query's uniform negatives with the
        retrieval model's top-scoring UNRATED items for that user.

        Uniform negatives are trivially separable (the tower already ranks
        them low), so a ranker trained on them learns little beyond the
        retrieval ordering; candidates the tower itself surfaces are
        exactly what the re-ranker must push below the true positives at
        serving time. No reference equivalent (it trains on uniform
        unrated negatives only, ``feature_engineering.py:260-280``).
        """
        cfg = self.cfg
        loaded = self._load_tower_embeddings()
        if loaded is None:
            logger.warning(
                "RANKER_HARD_NEG_FRAC=%.2f but no tower model at %s — "
                "keeping uniform negatives", cfg.RANKER_HARD_NEG_FRAC,
                cfg.EMBEDDING_MODEL_PATH,
            )
            return pairs
        model, user_embs, item_embs = loaded
        pool = min(cfg.RANKER_HARD_NEG_POOL, model.n_items)

        ratings = self.data.ratings
        rated = {
            u: set(g.values)
            for u, g in ratings.groupby("user_id")["item_id"]
        }
        pairs = pairs.reset_index(drop=True)
        neg_mask = pairs["label"].values == 0
        users = pairs["user_id"].values
        new_items = pairs["item_id"].values.copy()

        n_replaced = 0
        for u in np.unique(users):
            u_neg_idx = np.nonzero(neg_mask & (users == u))[0]
            n_hard = int(len(u_neg_idx) * cfg.RANKER_HARD_NEG_FRAC)
            if n_hard == 0 or u > model.n_users:
                continue
            scores = item_embs @ user_embs[u]
            top = np.argsort(-scores)[:pool] + 1  # item ids are 1-based
            u_rated = rated.get(u, set())
            # dedup against ALL of this user's current negatives — slots
            # past n_hard keep their originals, and when the pool runs
            # short some of the first n_hard slots do too
            keep = set(new_items[u_neg_idx].tolist())
            hard = [
                int(i) for i in top
                if i not in u_rated and i not in keep
            ][:n_hard]
            slots = u_neg_idx[: len(hard)]
            new_items[slots] = hard
            n_replaced += len(hard)
        pairs["item_id"] = new_items
        logger.info(
            "Hard-negative mining: replaced %d/%d negatives (frac=%.2f, "
            "pool=%d)", n_replaced, int(neg_mask.sum()),
            cfg.RANKER_HARD_NEG_FRAC, pool,
        )
        return pairs

    def _add_retrieval_score(self, *frames) -> list:
        """Score each (user, item) pair with the trained two-tower model and
        attach it as the ``retrieval_score`` column (train/serve consistent:
        serving passes the same similarity from the MIPS search)."""
        loaded = self._load_tower_embeddings()
        if loaded is None:
            logger.warning(
                "RANKER_USE_RETRIEVAL_SCORE set but no tower model at %s — "
                "skipping the retrieval_score feature",
                self.cfg.EMBEDDING_MODEL_PATH,
            )
            return []
        model, user_embs, item_embs = loaded
        for df in frames:
            uids = df["user_id"].values.astype(np.int64)
            iids = df["item_id"].values.astype(np.int64)
            u_ok = (uids >= 0) & (uids <= model.n_users)
            i_ok = (iids >= 1) & (iids <= model.n_items)
            ue = user_embs[np.where(u_ok, uids, 0)]
            ie = item_embs[np.where(i_ok, iids, 1) - 1]
            scores = np.einsum("nd,nd->n", ue, ie).astype(np.float32)
            df["retrieval_score"] = np.where(u_ok & i_ok, scores, 0.0)
        return ["retrieval_score"]

    def _evaluate_holdout(self, ranker, test_feats: pd.DataFrame, cols):
        """Per-query NDCG@10/20 + Recall@20 on the held-out queries
        (reference ``train_ranker.py:139-175``)."""
        scores = ranker.predict(test_feats)
        df = test_feats[["query_id", "item_id", "label"]].copy()
        df["score"] = scores

        ndcg10, ndcg20, rec20 = [], [], []
        for _, g in df.groupby("query_id"):
            ranked = g.sort_values("score", ascending=False)["item_id"].tolist()
            relevant = g[g["label"] == 1]["item_id"].tolist()
            if not relevant:
                continue
            ndcg10.append(ndcg_at_k(ranked, relevant, 10))
            ndcg20.append(ndcg_at_k(ranked, relevant, 20))
            rec20.append(recall_at_k(ranked, relevant, 20))
        return {
            "ndcg@10": float(np.mean(ndcg10)) if ndcg10 else 0.0,
            "ndcg@20": float(np.mean(ndcg20)) if ndcg20 else 0.0,
            "recall@20": float(np.mean(rec20)) if rec20 else 0.0,
            "n_queries": len(ndcg10),
        }
