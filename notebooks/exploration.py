# %% [markdown]
# # MovieLens exploration — recommendit_tpu
#
# Headless-runnable EDA (the analogue of the reference's
# `notebooks/exploration.ipynb`: rating distribution, long-tail popularity,
# genre/demographic/temporal analysis, feature preview). Run as a script
# (`python notebooks/exploration.py`) or open with jupytext as a notebook.
# Uses the real dataset when present, synthetic otherwise.

# %%
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd

from recommendit_tpu.data.movielens import load_or_synthesize
from recommendit_tpu.features.engineering import FeatureEngineer
from recommendit_tpu.features.schema import GENRES

DATA_DIR = os.environ.get("DATA_DIR", "data/ml-1m")
data = load_or_synthesize(DATA_DIR)
print(f"{len(data.ratings):,} ratings · {len(data.users):,} users · "
      f"{len(data.movies):,} movies")

# %% [markdown]
# ## Figures
#
# Plots are written to `FIG_DIR` (default `notebooks/figures/`) so the
# script stays headless-runnable; open with jupytext for inline display.

# %%
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

FIG_DIR = os.environ.get(
    "FIG_DIR", os.path.join(os.path.dirname(__file__) or ".", "figures"))
os.makedirs(FIG_DIR, exist_ok=True)
# single-hue marks (every figure is single-series: magnitude, not
# identity), neutral ink for text, recessive grid
HUE, INK = "#3573c2", "#444444"
plt.rcParams.update({
    "figure.figsize": (7, 3.2), "figure.dpi": 110,
    "axes.edgecolor": "#cccccc", "axes.labelcolor": INK,
    "axes.grid": True, "grid.color": "#e8e8e8", "grid.linewidth": 0.6,
    "axes.axisbelow": True,
    "axes.spines.top": False, "axes.spines.right": False,
    "text.color": INK, "xtick.color": INK, "ytick.color": INK,
})


def _savefig(name: str):
    plt.tight_layout()
    path = os.path.join(FIG_DIR, name)
    plt.savefig(path)
    plt.close()
    print(f"[fig] {path}")


# %% [markdown]
# ## Rating distribution

# %%
dist = data.ratings["rating"].value_counts().sort_index()
for r, c in dist.items():
    bar = "#" * int(60 * c / dist.max())
    print(f"  {r}★ {c:>9,} {bar}")
print(f"mean rating: {data.ratings['rating'].mean():.3f}  "
      f"(≥4 share: {(data.ratings['rating'] >= 4).mean():.1%})")

# %%
plt.bar(dist.index, dist.values, width=0.7, color=HUE)
plt.xticks(dist.index, [f"{r}★" for r in dist.index])
plt.ylabel("ratings")
plt.title("Rating distribution")
for r, c in dist.items():  # direct labels; counts stay in neutral ink
    plt.annotate(f"{c:,}", (r, c), ha="center", va="bottom", fontsize=8)
_savefig("rating_distribution.png")

# %% [markdown]
# ## Long-tail popularity

# %%
pop = data.ratings.groupby("item_id").size().sort_values(ascending=False)
cum = pop.cumsum() / pop.sum()
for q in (0.5, 0.8, 0.9):
    n = int((cum <= q).sum()) + 1
    print(f"top {n:>5} items ({n / len(pop):.1%} of catalog) "
          f"→ {q:.0%} of interactions")
print("head items:",
      [f"{i}({c})" for i, c in pop.head(5).items()])

# %%
plt.loglog(np.arange(1, len(pop) + 1), pop.values, color=HUE, lw=2)
plt.xlabel("item rank")
plt.ylabel("rating count")
plt.title("Long-tail item popularity")
_savefig("popularity_longtail.png")

# %% [markdown]
# ## Per-user activity

# %%
per_user = data.ratings.groupby("user_id").size()
print(f"ratings/user: median {per_user.median():.0f}, "
      f"p90 {per_user.quantile(0.9):.0f}, max {per_user.max()}")
plt.hist(per_user.values, bins=np.geomspace(1, per_user.max(), 40),
         color=HUE)
plt.xscale("log")
plt.xlabel("ratings per user")
plt.ylabel("users")
plt.title("User activity distribution")
_savefig("user_activity.png")

# %% [markdown]
# ## Genre analysis

# %%
genre_counts = (
    data.movies["genres"].str.get_dummies(sep="|")
    .reindex(columns=GENRES, fill_value=0).sum()
    .sort_values(ascending=False)
)
for g, c in genre_counts.head(10).items():
    print(f"  {g:<12} {c:>5} movies")

# %%
top_g = genre_counts.head(12)[::-1]
plt.barh(top_g.index, top_g.values, color=HUE, height=0.7)
plt.xlabel("movies")
plt.title("Catalog size by genre")
_savefig("genre_counts.png")

# %%
# mean rating by genre — magnitude over categories, same single hue
gd = data.movies["genres"].str.get_dummies(sep="|").reindex(
    columns=GENRES, fill_value=0)
rated = data.ratings.merge(
    gd, left_on="item_id", right_index=True, how="left")
genre_mean = pd.Series(
    {g: rated.loc[rated[g] == 1, "rating"].mean()
     for g in GENRES if rated[g].sum() > 0}
).sort_values()
plt.barh(genre_mean.index, genre_mean.values, color=HUE, height=0.7)
plt.xlim(max(0.0, genre_mean.min() - 0.3), genre_mean.max() + 0.1)
plt.xlabel("mean rating")
plt.title("Mean rating by genre")
_savefig("genre_mean_rating.png")

# %% [markdown]
# ## Demographics

# %%
print(data.users["gender"].value_counts(normalize=True).round(3).to_dict())
print("age buckets:", data.users["age"].value_counts().sort_index().to_dict())
print("occupations:", data.users["occupation"].nunique())

# %% [markdown]
# ## Temporal activity

# %%
by_month = data.ratings.set_index("timestamp").resample("ME").size()
print(f"active span: {by_month.index.min():%Y-%m} → {by_month.index.max():%Y-%m}")
print(f"peak month: {by_month.idxmax():%Y-%m} ({by_month.max():,} ratings)")

# %%
plt.plot(by_month.index, by_month.values, color=HUE, lw=2)
plt.ylabel("ratings / month")
plt.title("Rating activity over time")
_savefig("temporal_activity.png")

# %% [markdown]
# ## Release years

# %%
years = (
    data.movies["title"].str.extract(r"\((\d{4})\)\s*$")[0]
    .dropna().astype(int)
)
if len(years):
    yc = years.value_counts().sort_index()
    print(f"release years {yc.index.min()}–{yc.index.max()}, "
          f"busiest {yc.idxmax()} ({yc.max()} movies)")
    plt.plot(yc.index, yc.values, color=HUE, lw=2)
    plt.ylabel("movies")
    plt.title("Catalog by release year")
    _savefig("release_years.png")

# %% [markdown]
# ## Feature preview (the 50-column ranking contract)

# %%
fe = FeatureEngineer(DATA_DIR)
fe.set_data(data)
uf = fe.build_user_features()
itf = fe.build_item_features()
print("\nuser features:", [c for c in uf.columns if c != "genre_pref"])
print(uf.drop(columns=["genre_pref"]).describe().round(3).loc[["mean", "std"]])
print("\nitem features:", [c for c in itf.columns
                           if c not in ("genre_vector", "title")])
pairs, _ = fe.build_training_pairs(n_negatives=2, seed=0)
feats = fe.build_interaction_features(pairs.head(1000))
print(f"\ninteraction feature matrix: {feats.shape}; "
      f"genre_affinity mean {feats['genre_affinity'].mean():.3f}")
