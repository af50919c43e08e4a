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
# ## Rating distribution

# %%
dist = data.ratings["rating"].value_counts().sort_index()
for r, c in dist.items():
    bar = "#" * int(60 * c / dist.max())
    print(f"  {r}★ {c:>9,} {bar}")
print(f"mean rating: {data.ratings['rating'].mean():.3f}  "
      f"(≥4 share: {(data.ratings['rating'] >= 4).mean():.1%})")

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
