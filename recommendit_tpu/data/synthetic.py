"""Synthetic MovieLens-format data generator.

The reference's tests build a 50x100x2000 synthetic set inline
(``tests/test_features.py:27-70``); here the generator is a first-class
component so the full pipeline (features → training → retrieval → ranking →
eval → serving) can run end-to-end in air-gapped environments and at
arbitrary scale for benchmarks.

Ratings are drawn from a latent-factor model (user genre affinity + item
popularity + noise) so learned embeddings genuinely beat the popularity
baseline — a pure-uniform generator would make quality metrics meaningless.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from recommendit_tpu.features.schema import GENRES

_OCCUPATIONS = 21
_AGES = np.array([1, 18, 25, 35, 45, 50, 56])


def make_synthetic_movielens(
    n_users: int = 600,
    n_items: int = 400,
    n_ratings: int = 40_000,
    seed: int = 0,
    latent_dim: int = 8,
):
    """Build a MovieLensData with the reference's column contract."""
    from recommendit_tpu.data.movielens import MovieLensData

    rng = np.random.default_rng(seed)
    n_genres = len(GENRES)

    # --- Items: 1-3 genres each, zipf-ish popularity, a release year ---
    item_ids = np.arange(1, n_items + 1)
    genre_latent = rng.normal(size=(n_genres, latent_dim))
    item_n_genres = rng.integers(1, 4, size=n_items)
    item_genre_sets = [
        rng.choice(n_genres, size=k, replace=False) for k in item_n_genres
    ]
    item_latent = np.stack(
        [genre_latent[gs].mean(axis=0) for gs in item_genre_sets]
    ) + 0.3 * rng.normal(size=(n_items, latent_dim))
    item_pop = rng.zipf(1.4, size=n_items).astype(np.float64)
    item_pop = np.log1p(item_pop)
    item_pop /= item_pop.max()
    years = rng.integers(1940, 2001, size=n_items)
    titles = [f"Synthetic Movie {i} ({y})" for i, y in zip(item_ids, years)]
    genre_strs = ["|".join(GENRES[g] for g in sorted(gs)) for gs in item_genre_sets]
    movies = pd.DataFrame(
        {"item_id": item_ids, "title": titles, "genres": genre_strs}
    )

    # --- Users: latent taste + demographics ---
    user_ids = np.arange(1, n_users + 1)
    user_latent = rng.normal(size=(n_users, latent_dim))
    user_bias = rng.normal(scale=0.5, size=n_users)
    users = pd.DataFrame(
        {
            "user_id": user_ids,
            "gender": rng.choice(["M", "F"], size=n_users, p=[0.7, 0.3]),
            "age": rng.choice(_AGES, size=n_users),
            "occupation": rng.integers(0, _OCCUPATIONS, size=n_users),
            "zip_code": [f"{z:05d}" for z in rng.integers(0, 99999, size=n_users)],
        }
    )

    # --- Ratings: sample (user, item) with popularity-weighted items, ---
    # --- affinity-driven rating value, per-user time ordering         ---
    p_item = item_pop / item_pop.sum()
    u_idx = rng.integers(0, n_users, size=int(n_ratings * 1.3))
    i_idx = rng.choice(n_items, size=u_idx.size, p=p_item)
    pair_key = u_idx.astype(np.int64) * n_items + i_idx
    _, first = np.unique(pair_key, return_index=True)
    keep = np.sort(first)[:n_ratings]
    u_idx, i_idx = u_idx[keep], i_idx[keep]

    affinity = np.einsum("nd,nd->n", user_latent[u_idx], item_latent[i_idx])
    affinity = affinity / (np.std(affinity) + 1e-8)
    score = 3.3 + 0.9 * affinity + 0.5 * item_pop[i_idx] + user_bias[u_idx]
    score += 0.5 * rng.normal(size=score.shape)
    rating = np.clip(np.round(score), 1, 5).astype(np.int64)

    t0 = 956_000_000  # ~2000-04, matches ML-1M era
    timestamps = t0 + rng.integers(0, 3 * 365 * 86400, size=u_idx.size)

    ratings = pd.DataFrame(
        {
            "user_id": user_ids[u_idx],
            "item_id": item_ids[i_idx],
            "rating": rating,
            "timestamp": pd.to_datetime(timestamps, unit="s"),
        }
    ).sort_values("timestamp").reset_index(drop=True)

    return MovieLensData(ratings=ratings, users=users, movies=movies)
