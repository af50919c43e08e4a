"""Real-data readiness: golden ML-1M-format fixtures with the actual
file's parse quirks (latin-1 titles, multi-parenthetical years, trailing
whitespace after ``(year)``, ZIP+4 zip codes, non-contiguous item ids).

The real dataset cannot be downloaded here (air-gapped); these fixtures
make the first real-data run turnkey by pinning loader behavior to the
quirks the reference tolerates (``feature_engineering.py:39-72, 199-204``).
"""
from pathlib import Path

import numpy as np
import pytest

from recommendit_tpu.data.movielens import (
    MovieLensData,
    load_movielens,
    save_movielens,
    verify_dataset,
)

FIXTURE = Path(__file__).parent / "fixtures" / "ml1m_golden"


@pytest.fixture(scope="module")
def golden() -> MovieLensData:
    return load_movielens(str(FIXTURE))


class TestGoldenLoad:
    def test_verify(self):
        assert verify_dataset(FIXTURE)

    def test_shapes(self, golden):
        assert len(golden.users) == 30
        assert len(golden.movies) == 21
        assert len(golden.ratings) == 331

    def test_noncontiguous_item_ids(self, golden):
        # real ML-1M: 3883 movies, max id 3952 — tables must size by max id
        assert golden.n_items == 3952
        assert len(golden.movies) < golden.n_items

    def test_latin1_titles_preserved(self, golden):
        titles = golden.movies.set_index("item_id")["title"]
        assert titles[3433] == "Misérables, Les (1995)"
        assert "Cité des enfants perdus" in titles[29]

    def test_zip_codes_stay_strings(self, golden):
        zips = golden.users.set_index("user_id")["zip_code"]
        assert zips[4] == "02460"          # leading zero intact
        assert zips[25] == "01609-2101"    # ZIP+4 intact

    def test_dtypes(self, golden):
        r = golden.ratings
        for c in ("user_id", "item_id", "rating"):
            assert np.issubdtype(r[c].dtype, np.integer), c
        assert np.issubdtype(r["timestamp"].dtype, np.datetime64)
        assert golden.ratings["rating"].between(1, 5).all()

    def test_every_rating_resolves(self, golden):
        known = set(golden.movies["item_id"])
        assert set(golden.ratings["item_id"]) <= known
        assert set(golden.ratings["user_id"]) <= set(golden.users["user_id"])


class TestYearExtraction:
    """Pin the reference's exact year semantics (``:199-204``)."""

    def test_year_regex_matches_reference(self, golden):
        years = golden.movies["title"].str.extract(r"\((\d{4})\)$")[0]
        by_id = dict(zip(golden.movies["item_id"], years))
        assert by_id[1] == "1995"
        # multi-parenthetical: the LAST (....) is the year
        assert by_id[922] == "1950"
        assert by_id[573] == "1993"
        # trailing whitespace => regex miss (matches reference behavior,
        # which fills year_normalized = 0.5)
        assert by_id[1430] is np.nan or isinstance(by_id[1430], float)
        # no-year title => miss
        assert not isinstance(by_id[3893], str)

    def test_item_features_fill_unparsed_years(self, golden, tmp_path):
        from recommendit_tpu.features.engineering import FeatureEngineer

        fe = FeatureEngineer(str(FIXTURE), seed=0)
        fe.set_data(golden)
        itf = fe.build_item_features().set_index("item_id")
        assert itf.loc[1430, "year_normalized"] == pytest.approx(0.5)
        assert 0.0 <= itf["year_normalized"].min()
        assert itf["year_normalized"].max() <= 1.0

    def test_genre_vocab_covers_fixture(self, golden):
        from recommendit_tpu.features.schema import GENRES

        seen = set()
        for g in golden.movies["genres"]:
            seen.update(g.split("|"))
        assert seen <= set(GENRES)
        assert "Children's" in seen and "Film-Noir" in seen


class TestRoundTrip:
    def test_save_load_identity(self, golden, tmp_path):
        out = tmp_path / "ml"
        save_movielens(golden, str(out))
        back = load_movielens(str(out))
        assert back.ratings["user_id"].tolist() == golden.ratings["user_id"].tolist()
        assert back.ratings["rating"].tolist() == golden.ratings["rating"].tolist()
        assert back.movies["title"].tolist() == golden.movies["title"].tolist()
        assert back.users["zip_code"].tolist() == golden.users["zip_code"].tolist()

    def test_native_parser_agrees_with_python(self, golden):
        from recommendit_tpu.data import native

        if not native.available():
            pytest.skip("native fastparse not built")
        cols = native.parse_int4_file(str(FIXTURE / "ratings.dat"))
        assert cols is not None
        np.testing.assert_array_equal(
            cols[0], golden.ratings["user_id"].to_numpy()
        )
        np.testing.assert_array_equal(
            cols[2], golden.ratings["rating"].to_numpy()
        )


class TestGoldenPipeline:
    """The full feature stage runs on the quirky fixture without special
    casing — the turnkey check for the first real-data run."""

    def test_feature_stage(self, golden):
        from recommendit_tpu.features.engineering import FeatureEngineer

        fe = FeatureEngineer(str(FIXTURE), seed=0)
        fe.set_data(golden)
        uf = fe.build_user_features()
        itf = fe.build_item_features()
        assert len(uf) == 30
        assert uf["avg_rating"].between(1, 5).all()
        assert not itf.isna().any().any()
