"""Zero-copy feature snapshot: writer/reader round-trips (native C++ and
numpy backends), store-contract dict equality vs load_all_features, and
FeatureStore snapshot fallback with KV shadowing."""
import numpy as np
import pandas as pd
import pytest

from recommendit_tpu.features.snapshot import (
    FeatureSnapshot,
    native_available,
    write_snapshot,
    write_snapshot_from_frames,
)
from recommendit_tpu.features.store import FeatureStore

BACKENDS = ["numpy"] + (["native"] if native_available() else [])


def _frames():
    rng = np.random.default_rng(0)
    uf = pd.DataFrame({
        "user_id": [3, 1, 7],
        "avg_rating": [3.5, 4.0, 2.5],
        "log_rating_count": [1.0, 2.0, 0.5],
        **{f"genre_pref_{i}": rng.random(3) for i in range(4)},
    })
    itf = pd.DataFrame({
        "item_id": [10, 2, 30, 5],
        "title": ["a", "b", "c", "d"],
        "avg_rating": [3.0, 3.3, 4.1, 2.2],
        "popularity_score": [0.5, 0.1, 0.9, 0.3],
        **{f"genre_vec_{i}": rng.integers(0, 2, 4).astype(float)
           for i in range(4)},
    })
    return uf, itf


@pytest.mark.parametrize("backend", BACKENDS)
class TestSnapshotRoundTrip:
    def _open(self, path, backend):
        return FeatureSnapshot(str(path), prefer_native=(backend == "native"))

    def test_lookup_and_missing(self, tmp_path, backend):
        uf, itf = _frames()
        p = write_snapshot_from_frames(str(tmp_path / "f.fsnap"), uf, itf)
        snap = self._open(p, backend)
        assert snap.native == (backend == "native")
        assert snap.n_users() == 3 and snap.n_items() == 4
        row = snap.user_row(7)
        assert row is not None and row.shape == (6,)
        assert np.isclose(row[0], 2.5)
        assert snap.user_row(99) is None
        assert snap.item_row(30) is not None
        assert snap.item_row(0) is None
        snap.close()

    def test_gather(self, tmp_path, backend):
        uf, itf = _frames()
        p = write_snapshot_from_frames(str(tmp_path / "f.fsnap"), uf, itf)
        snap = self._open(p, backend)
        mat, found = snap.gather_items([10, 99, 5], fill=-1.0)
        assert mat.shape == (3, 6)
        assert list(found) == [True, False, True]
        assert (mat[1] == -1.0).all()
        assert np.isclose(mat[0, 0], 3.0)
        snap.close()

    def test_dicts_match_store_bulk_load(self, tmp_path, backend):
        """Snapshot dicts must equal what load_all_features would store
        (modulo item title, which is a string kept in serving metadata)."""
        uf, itf = _frames()
        p = write_snapshot_from_frames(str(tmp_path / "f.fsnap"), uf, itf)
        snap = self._open(p, backend)

        store = FeatureStore(redis_url="redis://localhost:9999")  # in-mem
        store.load_all_features(uf, itf)
        for uid in (1, 3, 7):
            expect = store.get_user_features(uid)
            got = snap.user_dict(uid)
            assert set(got) == set(expect)
            for k in expect:
                np.testing.assert_allclose(got[k], expect[k], atol=1e-6)
        for iid in (2, 10):
            expect = store.get_item_features(iid)
            expect.pop("title", None)
            got = snap.item_dict(iid)
            assert set(got) == set(expect)
            for k in expect:
                np.testing.assert_allclose(got[k], expect[k], atol=1e-6)
        snap.close()


@pytest.mark.skipif(not native_available(), reason="native lib not built")
class TestNativeMatchesNumpy:
    def test_identical_outputs(self, tmp_path):
        uf, itf = _frames()
        p = write_snapshot_from_frames(str(tmp_path / "f.fsnap"), uf, itf)
        a = FeatureSnapshot(str(p), prefer_native=True)
        b = FeatureSnapshot(str(p), prefer_native=False)
        assert a.native and not b.native
        for uid in (1, 3, 7, 42):
            ra, rb = a.user_row(uid), b.user_row(uid)
            if ra is None:
                assert rb is None
            else:
                np.testing.assert_array_equal(ra, rb)
        ma, fa = a.gather_items([5, 2, 77, 30])
        mb, fb = b.gather_items([5, 2, 77, 30])
        np.testing.assert_array_equal(ma, mb)
        np.testing.assert_array_equal(fa, fb)
        a.close()
        b.close()


class TestStoreSnapshotFallback:
    def test_miss_falls_through_and_writes_shadow(self, tmp_path):
        uf, itf = _frames()
        p = write_snapshot_from_frames(str(tmp_path / "f.fsnap"), uf, itf)
        store = FeatureStore(redis_url="redis://localhost:9999")
        store.attach_snapshot(FeatureSnapshot(str(p)))

        # cold store: reads come from the snapshot
        got = store.get_user_features(1)
        assert got is not None and np.isclose(got["avg_rating"], 4.0)
        batch = store.get_item_features_batch([10, 99, 5])
        assert batch[10] is not None and batch[99] is None

        # online write shadows the snapshot
        store.store_user_features(1, {"avg_rating": 9.0})
        assert store.get_user_features(1)["avg_rating"] == 9.0
        # untouched ids still served from the snapshot
        assert store.get_user_features(7) is not None

    def test_corrupt_magic_rejected(self, tmp_path):
        bad = tmp_path / "bad.fsnap"
        bad.write_bytes(b"NOTSNAP0" + b"\x00" * 64)
        (tmp_path / "bad.fsnap.meta.json").write_text(
            '{"user_cols": [], "item_cols": []}'
        )
        with pytest.raises(ValueError):
            FeatureSnapshot(str(bad), prefer_native=False)
        if native_available():
            with pytest.raises(ValueError):
                FeatureSnapshot(str(bad), prefer_native=True)

    def test_writer_validates_shapes(self, tmp_path):
        with pytest.raises(ValueError):
            write_snapshot(
                str(tmp_path / "x.fsnap"),
                np.arange(3), np.zeros((2, 4)),
                np.arange(2), np.zeros((2, 4)),
                ["a"] * 4, ["b"] * 4,
            )
