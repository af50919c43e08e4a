"""Feature layer tests (strategy mirrors reference tests/test_features.py:
synthetic data, invariant checks, store fallback as fake, parquet round-trip,
plus new contract-consistency tests across the three assembly paths)."""
import numpy as np
import pandas as pd
import pytest

from recommendit_tpu.features import schema
from recommendit_tpu.features.engineering import FeatureEngineer
from recommendit_tpu.features.schema import (
    FEATURE_COLUMNS,
    N_GENRES,
    assemble_online,
    assemble_packed_jnp,
    assemble_packed_np,
    encode_genres,
    encode_genres_matrix,
    pack_item_features,
    pack_user_features,
)
from recommendit_tpu.features.store import FeatureStore


class TestGenreEncoding:
    def test_multi_hot_shape_and_values(self):
        v = encode_genres("Action|Comedy")
        assert v.shape == (N_GENRES,)
        assert v.sum() == 2.0
        assert v[schema.GENRE_TO_IDX["Action"]] == 1.0
        assert v[schema.GENRE_TO_IDX["Comedy"]] == 1.0

    def test_unknown_genre_ignored(self):
        v = encode_genres("NotAGenre|Drama")
        assert v.sum() == 1.0

    def test_matrix_matches_scalar(self):
        strs = ["Action|Comedy", "Drama", "Sci-Fi|Thriller|War", "NotAGenre"]
        mat = encode_genres_matrix(strs)
        for i, s in enumerate(strs):
            np.testing.assert_array_equal(mat[i], encode_genres(s))


class TestUserFeatures:
    def test_invariants(self, engineered_features):
        uf = engineered_features.user_features
        assert uf["avg_rating"].between(1, 5).all()
        assert (uf["log_rating_count"] >= 0).all()
        assert uf["recency_score"].between(0, 1).all()
        assert uf["gender_encoded"].isin([0.0, 1.0]).all()
        assert uf["age_normalized"].between(0, 1).all()
        prefs = np.stack(uf["genre_pref"].values)
        assert prefs.shape[1] == N_GENRES
        norms = np.linalg.norm(prefs, axis=1)
        # normalized or all-zero
        assert np.all((np.abs(norms - 1) < 1e-5) | (norms < 1e-8))

    def test_no_nans(self, engineered_features):
        uf = engineered_features.user_features.drop(columns=["genre_pref"])
        assert not uf.isna().any().any()


class TestItemFeatures:
    def test_invariants(self, engineered_features):
        itf = engineered_features.item_features
        assert itf["avg_rating"].between(1, 5).all()
        assert itf["popularity_score"].between(0, 1).all()
        assert (itf["rating_stddev"] >= 0).all()
        assert itf["year_normalized"].between(0, 1).all()
        vecs = np.stack(itf["genre_vector"].values)
        assert set(np.unique(vecs)) <= {0.0, 1.0}


class TestTrainingPairs:
    def test_pos_neg_composition(self, engineered_features):
        train, test = engineered_features.build_training_pairs(
            n_negatives=4, seed=7
        )
        for df in (train, test):
            assert set(df["label"].unique()) <= {0, 1}
        all_pairs = pd.concat([train, test])
        n_pos = (all_pairs["label"] == 1).sum()
        n_neg = (all_pairs["label"] == 0).sum()
        assert n_pos > 0 and n_neg > 0
        # negatives per positive bounded by the requested ratio
        assert n_neg <= 4 * n_pos + len(all_pairs["user_id"].unique())

    def test_negatives_are_unrated(self, engineered_features, synthetic_data):
        train, test = engineered_features.build_training_pairs(seed=3)
        pairs = pd.concat([train, test])
        rated = set(
            zip(synthetic_data.ratings["user_id"], synthetic_data.ratings["item_id"])
        )
        negs = pairs[pairs["label"] == 0]
        overlap = sum(
            1 for u, i in zip(negs["user_id"], negs["item_id"]) if (u, i) in rated
        )
        assert overlap == 0

    def test_query_split_disjoint(self, engineered_features):
        train, test = engineered_features.build_training_pairs(seed=1)
        assert not (set(train["query_id"]) & set(test["query_id"]))

    def test_seeded_determinism(self, engineered_features):
        t1, _ = engineered_features.build_training_pairs(seed=5)
        t2, _ = engineered_features.build_training_pairs(seed=5)
        pd.testing.assert_frame_equal(t1, t2)


class TestInteractionFeatures:
    def test_contract_columns_and_ranges(self, engineered_features):
        train, _ = engineered_features.build_training_pairs(seed=2)
        feats = engineered_features.build_interaction_features(train.head(500))
        for c in FEATURE_COLUMNS:
            assert c in feats.columns, f"missing {c}"
        assert not feats[FEATURE_COLUMNS].isna().any().any()
        assert feats["genre_affinity"].between(-1.01, np.sqrt(N_GENRES) + 0.01).all()


class TestPackedAssembly:
    """The three assembly views must agree — this replaces the reference's
    copy-paste consistency-by-hand."""

    def test_np_vs_jnp(self):
        rng = np.random.default_rng(0)
        u = rng.normal(size=(schema.USER_PACKED_DIM,)).astype(np.float32)
        items = rng.normal(size=(37, schema.ITEM_PACKED_DIM)).astype(np.float32)
        out_np = assemble_packed_np(u, items)
        out_jnp = np.asarray(assemble_packed_jnp(u, items))
        assert out_np.shape == (37, 50)
        np.testing.assert_allclose(out_np, out_jnp, rtol=1e-5, atol=1e-6)

    def test_online_vs_packed(self, engineered_features, synthetic_data):
        fe = engineered_features
        n_items = synthetic_data.n_items
        n_users = synthetic_data.n_users
        user_table = pack_user_features(fe.user_features, n_users)
        item_table = pack_item_features(fe.item_features, n_items)

        uid = int(fe.user_features["user_id"].iloc[3])
        cand = fe.item_features["item_id"].iloc[:20].astype(int).tolist()

        urow = fe.user_features[fe.user_features["user_id"] == uid].iloc[0]
        udict = {c: urow[c] for c in schema.USER_SCALAR_COLS}
        udict["genre_pref"] = urow["genre_pref"]
        idicts = {}
        for iid in cand:
            irow = fe.item_features[fe.item_features["item_id"] == iid].iloc[0]
            idicts[iid] = {
                "avg_rating": irow["avg_rating"],
                "log_rating_count": irow["log_rating_count"],
                "popularity_score": irow["popularity_score"],
                "rating_stddev": irow["rating_stddev"],
                "year_normalized": irow["year_normalized"],
                "genre_vector": irow["genre_vector"],
            }

        online = assemble_online(udict, idicts, cand)
        packed = assemble_packed_np(user_table[uid], item_table[np.array(cand)])
        np.testing.assert_allclose(
            online[FEATURE_COLUMNS].values, packed, rtol=1e-5, atol=1e-5
        )

    def test_offline_vs_packed(self, engineered_features, synthetic_data):
        fe = engineered_features
        train, _ = fe.build_training_pairs(seed=11)
        sample = train.head(50)
        offline = fe.build_interaction_features(sample)

        user_table = pack_user_features(fe.user_features, synthetic_data.n_users)
        item_table = pack_item_features(fe.item_features, synthetic_data.n_items)
        for _, row in offline.head(10).iterrows():
            packed = assemble_packed_np(
                user_table[int(row["user_id"])],
                item_table[np.array([int(row["item_id"])])],
            )[0]
            np.testing.assert_allclose(
                row[FEATURE_COLUMNS].values.astype(np.float32),
                packed, rtol=1e-4, atol=1e-4,
            )


class TestFeatureStore:
    """Reference strategy: unreachable Redis URL forces the in-memory
    fallback (tests/test_features.py:231)."""

    @pytest.fixture
    def store(self):
        return FeatureStore(redis_url="redis://localhost:9999", ttl=60)

    def test_fallback_active(self, store):
        assert not store.is_redis_available
        assert store.stats()["backend"] == "in-memory"

    def test_user_roundtrip(self, store):
        feats = {"avg_rating": 3.7, "genre_pref": np.arange(18, dtype=np.float32)}
        store.store_user_features(1, feats)
        out = store.get_user_features(1)
        assert abs(out["avg_rating"] - 3.7) < 1e-9
        assert list(out["genre_pref"]) == list(range(18))
        assert store.get_user_features(999) is None

    def test_item_batch(self, store):
        for i in range(5):
            store.store_item_features(i, {"popularity_score": i / 10})
        out = store.get_item_features_batch([0, 3, 99])
        assert out[3]["popularity_score"] == 0.3
        assert out[99] is None

    def test_rec_cache(self, store):
        recs = [{"item_id": 1, "score": 0.9, "rank": 1}]
        store.cache_recommendations(7, recs)
        assert store.get_cached_recommendations(7)[0]["item_id"] == 1
        assert store.get_cached_recommendations(8) is None

    def test_bulk_load(self, store, engineered_features):
        fe = engineered_features
        uf = fe.user_features.copy()
        mat = np.stack(uf["genre_pref"].values)
        for i in range(N_GENRES):
            uf[f"genre_pref_{i}"] = mat[:, i]
        uf = uf.drop(columns=["genre_pref"])
        itf = fe.item_features.copy()
        mat = np.stack(itf["genre_vector"].values)
        for i in range(N_GENRES):
            itf[f"genre_vec_{i}"] = mat[:, i]
        itf = itf.drop(columns=["genre_vector"])

        store.load_all_features(uf, itf)
        uid = int(uf["user_id"].iloc[0])
        out = store.get_user_features(uid)
        assert "genre_pref" in out and len(out["genre_pref"]) == N_GENRES
        iid = int(itf["item_id"].iloc[0])
        out = store.get_item_features(iid)
        assert "genre_vector" in out and "title" in out


class TestSyntheticData:
    def test_deterministic_by_seed(self):
        from recommendit_tpu.data.synthetic import make_synthetic_movielens

        a = make_synthetic_movielens(n_users=30, n_items=40, n_ratings=500,
                                     seed=7)
        b = make_synthetic_movielens(n_users=30, n_items=40, n_ratings=500,
                                     seed=7)
        pd.testing.assert_frame_equal(a.ratings, b.ratings)
        pd.testing.assert_frame_equal(a.movies, b.movies)
        c = make_synthetic_movielens(n_users=30, n_items=40, n_ratings=500,
                                     seed=8)
        assert not a.ratings.equals(c.ratings)

    def test_download_raises_cleanly_offline(self, tmp_path, monkeypatch):
        """Zero-egress environments get an actionable error, not a stack of
        socket noise (reference data/download.py:45-67 contract)."""
        import urllib.request

        from recommendit_tpu.data.movielens import download_movielens

        def no_network(*a, **k):
            raise OSError("network unreachable")

        monkeypatch.setattr(urllib.request, "urlretrieve", no_network)
        with pytest.raises(RuntimeError, match="synthetic"):
            download_movielens(str(tmp_path))


class TestDatRoundTrip:
    def test_timestamps_survive_save_load(self, synthetic_data, tmp_path):
        """Regression: datetime64[s] series must round-trip through the
        .dat format as epoch seconds (a unit bug once crushed them to 0,
        silently breaking the temporal eval split)."""
        from recommendit_tpu.data.movielens import load_movielens, save_movielens

        save_movielens(synthetic_data, str(tmp_path / "ml"))
        back = load_movielens(str(tmp_path / "ml"))
        assert back.ratings["timestamp"].min().year >= 2000
        orig = synthetic_data.ratings.sort_values(
            ["user_id", "item_id"]).reset_index(drop=True)
        got = back.ratings.sort_values(
            ["user_id", "item_id"]).reset_index(drop=True)
        assert (
            orig["timestamp"].astype("datetime64[s]") == got["timestamp"]
        ).all()


class TestJsonSerializationFallback:
    def test_roundtrip_without_msgpack(self, monkeypatch):
        """The store must round-trip via JSON when msgpack is absent
        (reference serialization contract, feature_store.py:30-55)."""
        from recommendit_tpu.features import store as store_mod

        monkeypatch.setattr(store_mod, "MSGPACK_AVAILABLE", False)
        data = {"avg_rating": 3.5, "genre_pref": np.arange(3, dtype=np.float32),
                "count": np.int64(7)}
        raw = store_mod.serialize(data)
        assert raw.startswith(b"{")  # JSON, not msgpack
        out = store_mod.deserialize(raw)
        assert out["avg_rating"] == 3.5
        assert out["genre_pref"] == [0.0, 1.0, 2.0]
        assert out["count"] == 7

    def test_msgpack_bytes_readable_after_fallback_toggle(self, monkeypatch):
        """Data written with msgpack must still deserialize when msgpack is
        available (mixed-format stores)."""
        from recommendit_tpu.features import store as store_mod

        raw = store_mod.serialize({"a": 1})
        assert store_mod.deserialize(raw) == {"a": 1}


class TestParquetRoundTrip:
    def test_save_load_identity(self, engineered_features, tmp_path):
        fe = engineered_features
        fe.save_features(str(tmp_path))
        fe2 = FeatureEngineer()
        fe2.load_features(str(tmp_path))
        pd.testing.assert_frame_equal(
            fe.user_features.drop(columns=["genre_pref"]).reset_index(drop=True),
            fe2.user_features.drop(columns=["genre_pref"]).reset_index(drop=True),
            check_dtype=False,
        )
        np.testing.assert_allclose(
            np.stack(fe.user_features["genre_pref"].values),
            np.stack(fe2.user_features["genre_pref"].values),
        )
        np.testing.assert_allclose(
            np.stack(fe.item_features["genre_vector"].values),
            np.stack(fe2.item_features["genre_vector"].values),
        )
