"""Oracle-ceiling diagnostic for the two-stage synthetic benchmark.

Reorders each eval user's top-C tower candidates by the TRUE generative
hit probability (exposure x relevance, reconstructed from the generator's
latents) and reports the NDCG/Recall ceiling a perfect re-ranker could
reach on this data. If the oracle barely beats the cosine ordering, no
ranker can show lift and the generator needs more rankable signal; if the
oracle clearly wins, the gap is the ranker's to close.

Usage:
  JAX_PLATFORMS=cpu python scripts/ranker_headroom.py \
      --data-dir /tmp/q2/ml --models-dir /tmp/q2/models [--seed 0]
"""
from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

_erfc = np.vectorize(math.erfc)


def norm_sf(x):
    """Standard-normal survival function P(Z >= x), vectorized."""
    return 0.5 * _erfc(np.asarray(x, dtype=np.float64) / math.sqrt(2.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/q2/ml")
    ap.add_argument("--models-dir", default="/tmp/q2/models")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-users", type=int, default=1500)
    ap.add_argument("--n-items", type=int, default=1200)
    ap.add_argument("--n-ratings", type=int, default=150_000)
    ap.add_argument("--eval-users", type=int, default=150)
    ap.add_argument("--candidates", type=int, default=500)
    ap.add_argument("--weights", default=None,
                    help="JSON dict of SynthWeights field overrides")
    args = ap.parse_args()

    import jax.numpy as jnp

    from recommendit_tpu.data import synthetic as syn
    from recommendit_tpu.evaluation.metrics import evaluate_model
    from recommendit_tpu.models.two_tower import TwoTowerModel
    from recommendit_tpu.training.train_embeddings import build_genre_table

    import json as _json

    data, lat = syn.make_synthetic_movielens(
        n_users=args.n_users, n_items=args.n_items, n_ratings=args.n_ratings,
        seed=args.seed, return_latents=True,
        weights=_json.loads(args.weights) if args.weights else None,
    )
    r = data.ratings.sort_values("timestamp")
    cut = int(len(r) * 0.9)
    test_r = r.iloc[cut:]
    truth = (
        test_r[test_r["rating"] >= 4].groupby("user_id")["item_id"]
        .apply(list).to_dict()
    )
    users = list(truth.keys())[: args.eval_users]

    model = TwoTowerModel.load(f"{args.models_dir}/two_tower.npz")
    genre_table = build_genre_table(data.movies, model.n_items)
    item_ids = np.arange(1, model.n_items + 1, dtype=np.int64)
    item_embs = model.get_item_embeddings(item_ids, genre_table[1:])
    user_embs = np.asarray(
        model._jit_user(
            model.params, jnp.asarray(np.arange(model.n_users + 1))
        )
    )

    train_r = r.iloc[:cut]
    rated_train = {
        u: set(g.values) for u, g in train_r.groupby("user_id")["item_id"]
    }

    ss = lat["score_stats"]

    # Exposure saturates: a pair sampled k>=1 times appears once (dedup),
    # so P(pair present) = 1 - exp(-M q) with q the one-draw acceptance
    # rate. Fit the effective draw count M so expected presents = len(r).
    w = lat["weights"]
    taste_all, igu = lat["taste"], lat["item_genre_unit"]
    act, p_item = lat["activity"], lat["item_pop"] / lat["item_pop"].sum()
    match_all = taste_all @ igu.T                      # (U, I)
    latent_all = lat["user_latent"] @ lat["item_latent"].T
    tilt_all = (
        w.exposure_gamma * match_all / (ss["match_sd_exposure"] + 1e-12)
        + w.exposure_latent * latent_all / (ss["latent_sd"] + 1e-12)
        + w.exposure_quality * lat["item_quality"][None, :]
    )
    q_all = act[:, None] * p_item[None, :] / (1.0 + np.exp(-tilt_all))
    lo_m, hi_m = 1.0, 1e9
    for _ in range(60):
        mid = math.sqrt(lo_m * hi_m)
        tot = np.sum(1.0 - np.exp(-mid * q_all))
        if tot < len(r):
            lo_m = mid
        else:
            hi_m = mid
    M_eff = math.sqrt(lo_m * hi_m)
    print(f"fitted effective draws M = {M_eff:,.0f} "
          f"(expected presents {np.sum(1.0 - np.exp(-M_eff * q_all)):,.0f} "
          f"vs realized {len(r):,d})")
    thresh4 = lat["rating_edges"][2]  # score >= this → rating >= 4
    qual = lat["item_quality"]
    pop = lat["item_pop"]
    C = args.candidates

    orders = {k: {} for k in (
        "cosine", "oracle", "oracle_rel", "oracle_exp",
        "cosine_unseen", "oracle_unseen",
    )}
    for u in users:
        if u > model.n_users:
            continue
        scores = item_embs @ user_embs[u]
        top = np.argsort(-scores)[:C]
        cand0 = top                      # 0-based item index
        cand = top + 1                   # 1-based item id
        match = lat["item_genre_unit"][cand0] @ lat["taste"][u - 1]
        gz = (match - ss["genre_mu"]) / (ss["genre_sd"] + 1e-12)
        latz = (
            lat["item_latent"][cand0] @ lat["user_latent"][u - 1]
            - ss["latent_mu"]
        ) / (ss["latent_sd"] + 1e-12)
        mu = (
            w.latent * latz
            + w.genre * gz
            + w.quality * qual[cand0]
            + w.loyalty * (gz > w.loyalty_tau)
            + w.user_bias * lat["user_bias"][u - 1]
        )
        p_rel = norm_sf((thresh4 - mu) / w.noise)
        p_exp = 1.0 - np.exp(-M_eff * q_all[u - 1, cand0])

        def topk(v, k=20):
            sel = np.argsort(-v)[:k]
            return [int(cand[s]) for s in sel]

        orders["cosine"][u] = topk(scores[top])
        orders["oracle"][u] = topk(p_exp * p_rel)
        orders["oracle_rel"][u] = topk(p_rel)
        orders["oracle_exp"][u] = topk(p_exp)
        # a (u, i) pair occurs at most once in the dataset, so items rated
        # in train can never be test hits — the true Bayes ordering knows it
        seen = np.array([c in rated_train.get(u, ()) for c in cand])
        orders["cosine_unseen"][u] = topk(np.where(seen, -np.inf, scores[top]))
        orders["oracle_unseen"][u] = topk(np.where(seen, -np.inf, p_exp * p_rel))

    print(f"{'ordering':<12} {'ndcg@10':>8} {'recall@20':>10} {'mrr':>8}")
    for name, recs in orders.items():
        rep = evaluate_model(recs, truth, k_values=[10, 20])
        print(f"{name:<12} {rep['ndcg@10']:>8.4f} {rep['recall@20']:>10.4f} "
              f"{rep['mrr']:>8.4f}")


if __name__ == "__main__":
    main()
