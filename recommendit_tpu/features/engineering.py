"""Offline feature engineering — vectorized.

Same feature semantics and public surface as the reference
``FeatureEngineer`` (``src/features/feature_engineering.py:24-443``) but all
hot paths are matrix ops: genre multi-hot via ``str.get_dummies`` instead of
a 3.9k-row ``iterrows`` (reference ``:125-128``), user genre preferences via
grouped matrix sums instead of a per-user python loop (reference
``:134-144``), and negative sampling via vectorized rejection sampling.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from recommendit_tpu.data.movielens import MovieLensData, load_movielens
from recommendit_tpu.features import schema
from recommendit_tpu.features.schema import (
    N_GENRES,
    encode_genres_matrix,
    feature_columns,
)

logger = logging.getLogger(__name__)


class FeatureEngineer:
    """Builds user / item / interaction features for the two-stage pipeline."""

    def __init__(self, data_dir: str = "data/ml-1m", seed: int = 0):
        self.data_dir = Path(data_dir)
        self.seed = seed
        self.ratings_df: Optional[pd.DataFrame] = None
        self.users_df: Optional[pd.DataFrame] = None
        self.movies_df: Optional[pd.DataFrame] = None
        self.user_features: Optional[pd.DataFrame] = None
        self.item_features: Optional[pd.DataFrame] = None

    # ------------------------------------------------------------------ #
    # Data loading                                                         #
    # ------------------------------------------------------------------ #

    def load_data(self) -> None:
        data = load_movielens(str(self.data_dir))
        self.set_data(data)

    def set_data(self, data: MovieLensData) -> None:
        """Inject in-memory tables (synthetic data / tests)."""
        self.ratings_df = data.ratings
        self.users_df = data.users
        self.movies_df = data.movies

    # ------------------------------------------------------------------ #
    # User features                                                        #
    # ------------------------------------------------------------------ #

    def build_user_features(self) -> pd.DataFrame:
        """Per-user: avg_rating, log_rating_count, recency_score, demographics,
        rating-weighted L2-normalized 18-d genre preference.

        Semantics match reference ``build_user_features``
        (``feature_engineering.py:91-166``): genre_pref = mean over liked
        items (rating>=4) of genre_vec * (rating-3), L2-normalized.
        """
        logger.info("Building user features...")
        r = self.ratings_df

        stats = r.groupby("user_id").agg(
            avg_rating=("rating", "mean"),
            rating_count=("rating", "count"),
            last_timestamp=("timestamp", "max"),
        ).reset_index()

        ts_min, ts_max = stats["last_timestamp"].min(), stats["last_timestamp"].max()
        ts_range = (ts_max - ts_min).total_seconds()
        if ts_range > 0:
            stats["recency_score"] = (
                (stats["last_timestamp"] - ts_min).dt.total_seconds() / ts_range
            ).astype(np.float32)
        else:
            stats["recency_score"] = np.float32(1.0)
        stats["log_rating_count"] = np.log1p(stats["rating_count"]).astype(np.float32)
        stats = stats.drop(columns=["last_timestamp"])

        # Genre preference: grouped weighted mean in one matmul-like pass.
        genre_mat = encode_genres_matrix(self.movies_df["genres"].values)
        item_row = pd.Series(
            np.arange(len(self.movies_df)), index=self.movies_df["item_id"].values
        )
        liked = r[r["rating"] >= 4]
        liked = liked[liked["item_id"].isin(item_row.index)]
        rows = item_row.loc[liked["item_id"].values].values
        weights = (liked["rating"].values - 3).astype(np.float32)
        weighted_vecs = genre_mat[rows] * weights[:, None]

        uids, inv = np.unique(liked["user_id"].values, return_inverse=True)
        sums = np.zeros((len(uids), N_GENRES), dtype=np.float64)
        np.add.at(sums, inv, weighted_vecs)
        counts = np.bincount(inv, minlength=len(uids)).astype(np.float64)
        means = sums / counts[:, None]
        norms = np.linalg.norm(means, axis=1, keepdims=True)
        prefs = np.where(norms > 0, means / np.where(norms == 0, 1, norms), means)
        genre_pref_df = pd.DataFrame(
            {"user_id": uids, "genre_pref": list(prefs.astype(np.float32))}
        )

        demo = self.users_df[["user_id", "gender", "age", "occupation"]].copy()
        demo["gender_encoded"] = (demo["gender"] == "F").astype(np.float32)
        demo["age_normalized"] = (demo["age"] / demo["age"].max()).astype(np.float32)
        demo["occupation_normalized"] = (
            demo["occupation"] / max(demo["occupation"].max(), 1)
        ).astype(np.float32)
        demo = demo.drop(columns=["gender", "age", "occupation"])

        uf = stats.merge(demo, on="user_id", how="left")
        uf = uf.merge(genre_pref_df, on="user_id", how="left")
        zero = np.zeros(N_GENRES, dtype=np.float32)
        uf["genre_pref"] = uf["genre_pref"].apply(
            lambda x: x if isinstance(x, np.ndarray) else zero
        )
        for c in ("gender_encoded", "age_normalized", "occupation_normalized"):
            uf[c] = uf[c].fillna(0.0)

        self.user_features = uf
        logger.info("Built user features for %d users", len(uf))
        return uf

    # ------------------------------------------------------------------ #
    # Item features                                                        #
    # ------------------------------------------------------------------ #

    def build_item_features(self) -> pd.DataFrame:
        """Per-item: rating stats, log-normalized popularity, genre multi-hot,
        year-from-title (reference ``build_item_features``,
        ``feature_engineering.py:172-219``)."""
        logger.info("Building item features...")
        r = self.ratings_df

        stats = r.groupby("item_id").agg(
            avg_rating=("rating", "mean"),
            rating_count=("rating", "count"),
            rating_stddev=("rating", "std"),
        ).reset_index()
        stats["rating_stddev"] = stats["rating_stddev"].fillna(0.0)
        stats["log_rating_count"] = np.log1p(stats["rating_count"]).astype(np.float32)
        max_log = stats["log_rating_count"].max()
        stats["popularity_score"] = (stats["log_rating_count"] / max_log).astype(
            np.float32
        )

        movies = self.movies_df.copy()
        genre_mat = encode_genres_matrix(movies["genres"].values)
        movies["genre_vector"] = list(genre_mat)
        years = movies["title"].str.extract(r"\((\d{4})\)$")[0].astype(float)
        y_min, y_max = years.min(), years.max()
        movies["year_normalized"] = (
            ((years - y_min) / (y_max - y_min + 1e-8)).astype(np.float32).fillna(0.5)
        )

        itf = stats.merge(
            movies[["item_id", "title", "genre_vector", "year_normalized"]],
            on="item_id", how="left",
        )
        zero = np.zeros(N_GENRES, dtype=np.float32)
        itf["genre_vector"] = itf["genre_vector"].apply(
            lambda x: x if isinstance(x, np.ndarray) else zero
        )
        itf["year_normalized"] = itf["year_normalized"].fillna(0.5)

        self.item_features = itf
        logger.info("Built item features for %d items", len(itf))
        return itf

    # ------------------------------------------------------------------ #
    # Training pairs                                                       #
    # ------------------------------------------------------------------ #

    def build_training_pairs(
        self,
        ratings_df: Optional[pd.DataFrame] = None,
        n_negatives: int = 4,
        test_ratio: float = 0.1,
        seed: Optional[int] = None,
    ) -> Tuple[pd.DataFrame, pd.DataFrame]:
        """Positive (rating>=4) + sampled-unrated-negative pairs with a
        query-level test split (reference ``build_training_pairs``,
        ``feature_engineering.py:225-300``), seeded for reproducibility.

        Negatives use vectorized rejection sampling from the catalog instead
        of materializing each user's unrated set.
        """
        if ratings_df is None:
            ratings_df = self.ratings_df
        rng = np.random.default_rng(self.seed if seed is None else seed)

        all_items = ratings_df["item_id"].unique()
        n_catalog = len(all_items)
        logger.info("Building training pairs (%d negatives/positive)...", n_negatives)

        # positives: one row per rating>=4 (vectorized)
        rs = ratings_df.sort_values(["user_id", "timestamp"])
        pos = rs[rs["rating"] >= 4]
        pos_per_user = pos.groupby("user_id").size()
        rated_per_user = rs.groupby("user_id").size()

        # eligible users: at least one positive and enough unrated items
        eligible = pos_per_user.index[
            (n_catalog - rated_per_user.reindex(pos_per_user.index).values)
            >= n_negatives
        ]
        pos = pos[pos["user_id"].isin(eligible)]

        # negatives: vectorized rejection sampling — draw uniform catalog
        # items for every (user, slot), reject rated or duplicate draws,
        # redraw only the rejects (a few rounds suffice)
        n_pos_u = pos.groupby("user_id").size()
        neg_users = np.repeat(
            n_pos_u.index.values,
            np.minimum(
                n_pos_u.values * n_negatives,
                n_catalog - rated_per_user.reindex(n_pos_u.index).values,
            ),
        )
        n_neg_total = len(neg_users)
        # integer pair keys make both the rated-membership test (sorted
        # isin) and the within-user dedup vectorized
        mod = np.int64(max(ratings_df["item_id"].max(), all_items.max()) + 1)
        rated_key = np.sort(
            ratings_df["user_id"].values.astype(np.int64) * mod
            + ratings_df["item_id"].values.astype(np.int64)
        )
        neg_users = neg_users.astype(np.int64)
        neg_items = rng.choice(all_items, size=n_neg_total).astype(np.int64)
        bad = np.zeros(n_neg_total, bool)
        for _ in range(20):
            key = neg_users * mod + neg_items
            pos_in_rated = np.searchsorted(rated_key, key)
            pos_in_rated = np.minimum(pos_in_rated, len(rated_key) - 1)
            bad = rated_key[pos_in_rated] == key
            bad |= pd.Series(key).duplicated(keep="first").values
            n_bad = int(bad.sum())
            if n_bad == 0:
                break
            neg_items[bad] = rng.choice(all_items, size=n_bad)
        if bad.any():
            # exact fallback for users needing (nearly) all their unrated
            # items — uniform redraw converges too slowly there
            item_set = set(all_items.tolist())
            rated_by_user = ratings_df.groupby("user_id")["item_id"].agg(set)
            bad_idx = np.nonzero(bad)[0]
            for u in np.unique(neg_users[bad_idx]):
                u_mask = neg_users == u
                u_bad = bad & u_mask
                taken = set(neg_items[u_mask & ~bad].tolist())
                avail = list(item_set - rated_by_user.get(u, set()) - taken)
                rng.shuffle(avail)
                slots = np.nonzero(u_bad)[0]
                neg_items[slots] = avail[: len(slots)]

        pairs_df = pd.concat(
            [
                pd.DataFrame({
                    "user_id": pos["user_id"].values,
                    "item_id": pos["item_id"].values,
                    "label": np.ones(len(pos), np.int64),
                    "rating": pos["rating"].values,
                }),
                pd.DataFrame({
                    "user_id": neg_users,
                    "item_id": neg_items,
                    "label": np.zeros(n_neg_total, np.int64),
                    "rating": np.zeros(n_neg_total, np.int64),
                }),
            ],
            ignore_index=True,
        ).sort_values(["user_id", "label"], ascending=[True, False],
                      kind="stable").reset_index(drop=True)
        pairs_df["query_id"] = pairs_df["user_id"].astype("category").cat.codes

        unique_q = pairs_df["query_id"].unique().copy()
        rng.shuffle(unique_q)
        n_test = max(1, int(len(unique_q) * test_ratio))
        test_q = set(unique_q[:n_test])
        train_df = pairs_df[~pairs_df["query_id"].isin(test_q)].copy()
        test_df = pairs_df[pairs_df["query_id"].isin(test_q)].copy()
        logger.info(
            "Training pairs: %d train, %d test (%d/%d queries)",
            len(train_df), len(test_df),
            train_df["query_id"].nunique(), test_df["query_id"].nunique(),
        )
        return train_df, test_df

    # ------------------------------------------------------------------ #
    # Interaction features                                                 #
    # ------------------------------------------------------------------ #

    def build_interaction_features(self, pairs_df: pd.DataFrame) -> pd.DataFrame:
        """Join user+item features onto pairs; delegates to the shared
        contract module (the reference re-implements this three times)."""
        if self.user_features is None or self.item_features is None:
            raise RuntimeError(
                "Call build_user_features() and build_item_features() first."
            )
        return schema.assemble_frame(pairs_df, self.user_features, self.item_features)

    # ------------------------------------------------------------------ #
    # Persistence                                                          #
    # ------------------------------------------------------------------ #

    def save_features(self, output_dir: str = "data/features") -> None:
        """Parquet round-trip with genre arrays flattened to columns
        (reference ``feature_engineering.py:376-406`` format)."""
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)

        if self.user_features is not None:
            uf = self.user_features.copy()
            mat = np.stack(uf["genre_pref"].values)
            gdf = pd.DataFrame(mat, columns=[f"genre_pref_{i}" for i in range(N_GENRES)])
            uf = pd.concat(
                [uf.drop(columns=["genre_pref"]).reset_index(drop=True), gdf], axis=1
            )
            uf.to_parquet(out / "user_features.parquet", index=False)

        if self.item_features is not None:
            itf = self.item_features.copy()
            mat = np.stack(itf["genre_vector"].values)
            gdf = pd.DataFrame(mat, columns=[f"genre_vec_{i}" for i in range(N_GENRES)])
            itf = pd.concat(
                [itf.drop(columns=["genre_vector"]).reset_index(drop=True), gdf], axis=1
            )
            itf.to_parquet(out / "item_features.parquet", index=False)
        logger.info("Saved features to %s", out)

    def load_features(self, features_dir: str = "data/features") -> None:
        """Inverse of :meth:`save_features`
        (reference ``feature_engineering.py:408-432``)."""
        d = Path(features_dir)
        up, ip = d / "user_features.parquet", d / "item_features.parquet"

        if up.exists():
            uf = pd.read_parquet(up)
            cols = [f"genre_pref_{i}" for i in range(N_GENRES)]
            if all(c in uf.columns for c in cols):
                uf["genre_pref"] = list(uf[cols].values.astype(np.float32))
                uf = uf.drop(columns=cols)
            self.user_features = uf
        if ip.exists():
            itf = pd.read_parquet(ip)
            cols = [f"genre_vec_{i}" for i in range(N_GENRES)]
            if all(c in itf.columns for c in cols):
                itf["genre_vector"] = list(itf[cols].values.astype(np.float32))
                itf = itf.drop(columns=cols)
            self.item_features = itf
        logger.info("Loaded features from %s", d)

    @staticmethod
    def get_feature_columns() -> List[str]:
        return feature_columns()
