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

        cols = feature_columns()
        frames = None
        if cfg.RANKER_TRAINING_MODE == "candidates":
            try:
                frames = self._build_candidate_frames()
            except RuntimeError as exc:
                logger.warning(
                    "candidate ranker training unavailable (%s) — falling "
                    "back to pair training", exc,
                )
        if frames is not None:
            train_feats, test_feats, tower_cols = frames
            cols = cols + tower_cols
        else:
            train_pairs, test_pairs = fe.build_training_pairs(
                n_negatives=cfg.N_NEGATIVES, seed=cfg.SEED
            )
            if cfg.RANKER_HARD_NEG_FRAC > 0.0:
                train_pairs = self._mine_hard_negatives(train_pairs)
            train_feats = fe.build_interaction_features(train_pairs)
            test_feats = fe.build_interaction_features(test_pairs)
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

    def _build_candidate_frames(self):
        """Train the ranker on the SERVING distribution: real retrieval
        candidates, labeled by a held-out temporal slice.

        The reference trains its re-ranker on positives + uniform unrated
        negatives (``feature_engineering.py:225-300``) — a distribution the
        retrieval stage never serves. A ranker fit there learns mostly
        "popular items get rated", which the bias-aware tower already
        encodes, so re-ranking its candidates adds nothing (measured: a
        plain logistic fit on real candidate features beats the
        pair-trained LambdaRank by 1.7x NDCG@10). The production recipe is
        to learn from the candidate logs of the deployed retriever; offline
        we reconstruct it with an inner temporal split:

          1. split this trainer's data view (itself the outer train window)
             into history (first 1-f) and label (last f) slices;
          2. train an INNER tower + index on the history slice only — the
             serving tower cannot be reused because it memorizes the label
             slice (its own training data), which corrupts retrieval_score;
          3. for each user with a label-slice positive, retrieve the same
             candidate set serving would (top TOP_K_CANDIDATES,
             seen-filtered), label candidates by the held-out slice, and
             assemble features from history-slice tables via the shared
             packed contract (bit-identical to serving assembly);
          4. keep every positive + a mixed sample of negatives (the top of
             the retrieval order, where re-ranking errors cost NDCG, plus
             uniform draws from the tail for calibration).

        With ``RANKER_CAND_FOLDS`` > 1, several inner splits are pooled:
        fold j labels on the slice ``[1-(j+1)f, 1-jf)`` with an inner tower
        trained on everything before it. Each fold's candidates come from a
        DIFFERENT tower version, so the pooled ranker must learn patterns
        that survive tower retraining — the offline analogue of training on
        several days of a production retriever's candidate logs, and the
        direct mitigation for the inner-tower -> serving-tower candidate
        distribution shift (measured: holdout +27% over the retrieval
        ordering collapsed to +2% at serve time on single-fold training).

        Returns (train_feats, test_feats, extra_cols); users are split
        9/1 (all their folds' groups together) for the holdout report.
        """
        cfg = self.cfg
        rng = np.random.default_rng(cfg.SEED)
        r = self.data.ratings.sort_values("timestamp")
        f = cfg.RANKER_LABEL_FRACTION
        folds = max(1, cfg.RANKER_CAND_FOLDS)
        if folds * f > 0.5:
            raise RuntimeError(
                f"RANKER_CAND_FOLDS={folds} x RANKER_LABEL_FRACTION={f} "
                "would label more than half the training window"
            )
        frames = []
        for j in range(folds):
            hi = int(len(r) * (1.0 - j * f))
            lo = int(len(r) * (1.0 - (j + 1) * f))
            try:
                # per-fold rng: folds are independent of each other and of
                # fold count, making the fold frames cacheable across
                # ranker-config A/Bs (RANKER_FOLD_CACHE_DIR)
                frames.extend(
                    self._fold_candidate_frames(
                        r.iloc[:lo].reset_index(drop=True), r.iloc[lo:hi],
                        np.random.default_rng(cfg.SEED + 1_000_003 * (j + 1)),
                        fold=j,
                    )
                )
            except RuntimeError:
                if j == 0 or not frames:
                    raise
                logger.warning(
                    "candidate fold %d has no labelable users — pooling "
                    "the %d earlier fold(s) only", j, j,
                )
                break
        all_feats = pd.concat(frames, ignore_index=True)

        users = np.unique(all_feats["user_id"].values)
        rng.shuffle(users)
        n_test = max(1, len(users) // 10)
        test_u = set(users[:n_test].tolist())
        test_feats = all_feats[all_feats["user_id"].isin(test_u)]
        train_feats = all_feats[~all_feats["user_id"].isin(test_u)]
        logger.info(
            "Candidate ranker training: %d folds, %d users (%d held out), "
            "%d rows, %.4f positive rate",
            folds, len(users), n_test, len(all_feats),
            all_feats["label"].mean(),
        )
        extra = []
        for col, keep in (
            ("retrieval_score", cfg.RANKER_USE_RETRIEVAL_SCORE),
            ("retrieval_rank", cfg.RANKER_USE_RETRIEVAL_RANK),
        ):
            if keep:
                extra.append(col)
            else:
                train_feats = train_feats.drop(columns=[col])
                test_feats = test_feats.drop(columns=[col])
        return train_feats.copy(), test_feats.copy(), extra

    def _fold_cache_path(self, fold: int, hist, label):
        """Disk-cache key for one fold's candidate frame: the frame
        depends only on the dataset slice, the inner-tower config, and
        the candidate-generation knobs — NOT on the ranker family/loss,
        so config A/Bs (scripts/ranker_ab.py) can skip the ~15-min inner
        tower retrain per fold. Off unless RANKER_FOLD_CACHE_DIR is set."""
        d = self.cfg.RANKER_FOLD_CACHE_DIR
        if not d:
            return None
        import hashlib
        import json as _json

        cfg = self.cfg
        key = {
            "fold": fold,
            "n_hist": len(hist), "n_label": len(label),
            # str(): timestamps may be ints or pandas Timestamps
            "t0": str(hist["timestamp"].iloc[0]) if len(hist) else "",
            "t1": str(hist["timestamp"].iloc[-1]) if len(hist) else "",
            "seed": cfg.SEED, "epochs": cfg.TRAIN_EPOCHS,
            "dim": cfg.EMBEDDING_DIM, "temp": cfg.SOFTMAX_TEMPERATURE,
            # every inner-tower training knob that changes the candidate
            # frames must be in the key, or an A/B varying it would
            # silently reuse stale folds (round-4 advisor finding)
            "loss_mode": cfg.LOSS_MODE, "lr": cfg.LEARNING_RATE,
            "bs": cfg.BATCH_SIZE, "hidden": cfg.HIDDEN_DIM,
            "idx_dtype": cfg.INDEX_DTYPE, "k": cfg.TOP_K_CANDIDATES,
            "filter_seen": cfg.FILTER_SEEN,
            "negs": cfg.RANKER_CAND_NEGS,
            "max_q": cfg.RANKER_MAX_QUERIES,
            "label_frac": cfg.RANKER_LABEL_FRACTION,
        }
        h = hashlib.sha1(
            _json.dumps(key, sort_keys=True).encode()
        ).hexdigest()[:16]
        from pathlib import Path as _P

        return _P(d) / f"cand_fold{fold}_{h}.parquet"

    def _fold_candidate_frames(self, hist, label, rng, fold: int = 0):
        """One inner split's candidate frames: train an inner tower on
        ``hist``, retrieve serving-shaped candidates, label them from
        ``label``. Query ids are offset per fold so group losses never mix
        folds."""
        import tempfile

        cfg = self.cfg
        cache = self._fold_cache_path(fold, hist, label)
        if cache is not None and cache.exists():
            logger.info("fold %d candidate frame: cache hit (%s)", fold,
                        cache)
            return [pd.read_parquet(cache)]
        inner = MovieLensData(
            ratings=hist, users=self.data.users, movies=self.data.movies
        )

        from recommendit_tpu.features.schema import (
            assemble_packed_np,
            pack_item_features,
            pack_user_features,
        )
        from recommendit_tpu.models.retrieval import MIPSIndex
        from recommendit_tpu.training.train_embeddings import (
            EmbeddingTrainer,
            build_genre_table,
        )

        with tempfile.TemporaryDirectory() as tmp:
            trainer = EmbeddingTrainer(
                inner, cfg, model_output_path=f"{tmp}/inner_tower.npz"
            )
            model = trainer.train()

        genre_table = build_genre_table(inner.movies, model.n_items)
        item_ids = np.arange(1, model.n_items + 1, dtype=np.int64)
        item_embs = model.get_item_embeddings(item_ids, genre_table[1:])
        bias = cfg.SOFTMAX_TEMPERATURE * model.item_bias_np(item_ids)
        index = MIPSIndex(
            embedding_dim=model.embed_dim,
            block_size=cfg.RETRIEVAL_BLOCK_ITEMS,
            dtype=cfg.INDEX_DTYPE, quant_seed=cfg.SEED,
        )
        index.build(item_embs, item_ids,
                    bias=bias if np.any(bias) else None)

        ife = FeatureEngineer(seed=cfg.SEED)
        ife.set_data(inner)
        ife.build_user_features()
        ife.build_item_features()
        user_table = pack_user_features(ife.user_features, inner.n_users)
        item_table = pack_item_features(ife.item_features, inner.n_items)

        pos_by_user = {
            u: set(g.values) for u, g in
            label[label["rating"] >= 4].groupby("user_id")["item_id"]
        }
        seen_by_user = {
            u: set(g.values) for u, g in hist.groupby("user_id")["item_id"]
        }
        users = [u for u in sorted(pos_by_user) if 1 <= u <= model.n_users]
        if not users:
            raise RuntimeError(
                "candidate ranker training: no users with label-window "
                "positives — dataset too small for "
                f"RANKER_LABEL_FRACTION={cfg.RANKER_LABEL_FRACTION}"
            )
        if len(users) > cfg.RANKER_MAX_QUERIES:
            users = sorted(
                rng.choice(np.asarray(users), size=cfg.RANKER_MAX_QUERIES,
                           replace=False).tolist()
            )
            logger.info(
                "Candidate ranker training: subsampled to %d queries "
                "(RANKER_MAX_QUERIES)", len(users),
            )

        k = min(cfg.TOP_K_CANDIDATES, index.n_total)
        import jax.numpy as jnp

        q = np.asarray(model._jit_user(
            model.params, jnp.asarray(np.asarray(users, np.int64))
        ), dtype=np.float32)
        vals, ids = index.batch_search(q, k=k)

        n_top = cfg.RANKER_CAND_NEGS // 2
        frames = []
        for uix, u in enumerate(users):
            cand, score = ids[uix], vals[uix].astype(np.float32)
            if cfg.FILTER_SEEN and u in seen_by_user:
                keep = ~np.isin(cand, list(seen_by_user[u]))
                cand, score = cand[keep], score[keep]
            # retrieval position among unseen candidates — serving computes
            # the same rank (cumsum over the unseen mask), so unlike the raw
            # score this feature's distribution cannot shift between the
            # inner-tower training candidates and the serving tower's
            rank = np.arange(len(cand), dtype=np.float32)
            y = np.isin(cand, list(pos_by_user[u]))
            neg_idx = np.nonzero(~y)[0]
            # head of the retrieval order + uniform tail sample
            tail = neg_idx[n_top:]
            n_tail = min(cfg.RANKER_CAND_NEGS - n_top, len(tail))
            sel_neg = np.concatenate([
                neg_idx[:n_top],
                rng.choice(tail, size=n_tail, replace=False)
                if n_tail else tail[:0],
            ])
            sel = np.sort(np.concatenate([np.nonzero(y)[0], sel_neg]))
            cand, score, y = cand[sel], score[sel], y[sel]
            feats = assemble_packed_np(user_table[u], item_table[cand])
            df = pd.DataFrame(feats, columns=feature_columns())
            df["retrieval_score"] = score
            df["retrieval_rank"] = np.log1p(rank[sel])
            df["query_id"] = u + fold * (model.n_users + 1)
            df["user_id"] = u
            df["item_id"] = cand
            df["label"] = y.astype(np.int64)
            frames.append(df)
        out = pd.concat(frames, ignore_index=True)
        if cache is not None:
            cache.parent.mkdir(parents=True, exist_ok=True)
            out.to_parquet(cache)
            logger.info("fold %d candidate frame: cached to %s", fold, cache)
        return [out]

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
        (reference ``train_ranker.py:139-175``).

        Also reports the RETRIEVAL ordering's NDCG@10 on the same groups
        (``base_ndcg@10``) when a retrieval feature is present — the paired
        in-distribution baseline that separates "the ranker can't learn the
        signal" (ndcg ~= base) from "the ranker learns it but the serving
        candidate distribution shifts" (ndcg >> base, serving eval flat).
        """
        scores = ranker.predict(test_feats)
        df = test_feats[["query_id", "item_id", "label"]].copy()
        df["score"] = scores
        base_col = next(
            (c for c in ("retrieval_rank", "retrieval_score")
             if c in test_feats.columns), None,
        )
        if base_col is not None:
            # rank ascending = better; score descending = better
            sgn = -1.0 if base_col == "retrieval_rank" else 1.0
            df["base"] = sgn * test_feats[base_col].values

        ndcg10, ndcg20, rec20, base10 = [], [], [], []
        for _, g in df.groupby("query_id"):
            ranked = g.sort_values("score", ascending=False)["item_id"].tolist()
            relevant = g[g["label"] == 1]["item_id"].tolist()
            if not relevant:
                continue
            ndcg10.append(ndcg_at_k(ranked, relevant, 10))
            ndcg20.append(ndcg_at_k(ranked, relevant, 20))
            rec20.append(recall_at_k(ranked, relevant, 20))
            if base_col is not None:
                base_ranked = g.sort_values(
                    "base", ascending=False)["item_id"].tolist()
                base10.append(ndcg_at_k(base_ranked, relevant, 10))
        out = {
            "ndcg@10": float(np.mean(ndcg10)) if ndcg10 else 0.0,
            "ndcg@20": float(np.mean(ndcg20)) if ndcg20 else 0.0,
            "recall@20": float(np.mean(rec20)) if rec20 else 0.0,
            "n_queries": len(ndcg10),
        }
        if base10:
            out["base_ndcg@10"] = float(np.mean(base10))
        return out
