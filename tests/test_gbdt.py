"""Histogram GBDT LambdaRank tests (same synthetic query-grouped data
strategy as the MLP ranker tests)."""
import numpy as np
import pytest

from recommendit_tpu.models.gbdt import (
    HistGBDTRanker,
    lambdarank_grad_hess,
)
from tests.test_ranker import FEATURES, make_ranker_data


class TestLambdaRankGradHess:
    def test_gradient_direction(self):
        """Higher-gain item scored lower must get a negative (score-up)
        gradient."""
        scores = np.array([0.0, 1.0])       # item 0 (relevant) ranked below
        gains = np.array([1.0, 0.0])
        offs = np.array([0, 2])
        g, h = lambdarank_grad_hess(scores, gains, offs)
        assert g[0] < 0 and g[1] > 0        # push 0 up, 1 down
        assert (h >= 0).all()

    def test_no_pairs_zero(self):
        g, h = lambdarank_grad_hess(
            np.array([1.0, 2.0]), np.array([1.0, 1.0]), np.array([0, 2])
        )
        assert (g == 0).all() and (h == 0).all()

    def test_groups_independent(self):
        scores = np.array([0.0, 1.0, 0.0, 1.0])
        gains = np.array([1.0, 0.0, 0.0, 0.0])
        offs = np.array([0, 2, 4])
        g, _ = lambdarank_grad_hess(scores, gains, offs)
        assert (g[2:] == 0).all()           # second group has no pairs


class TestHistGBDTRanker:
    @pytest.fixture(scope="class")
    def trained(self):
        df = make_ranker_data(n_queries=40, group=30)
        valid = make_ranker_data(n_queries=10, seed=1)
        r = HistGBDTRanker(n_estimators=40, learning_rate=0.2, max_depth=4,
                           n_bins=32, early_stop_rounds=15, seed=0)
        r.train(df, FEATURES, valid_df=valid)
        return r, df

    def test_learns_ranking(self, trained):
        from recommendit_tpu.evaluation.metrics import ndcg_at_k

        r, _ = trained
        test = make_ranker_data(n_queries=10, seed=9)
        scores = r.predict(test)
        test = test.copy()
        test["score"] = scores
        ndcgs = []
        for _, g in test.groupby("query_id"):
            ranked = g.sort_values("score", ascending=False)["item_id"].tolist()
            rel = g[g["label"] == 1]["item_id"].tolist()
            ndcgs.append(ndcg_at_k(ranked, rel, 10))
        assert np.mean(ndcgs) > 0.6

    def test_importance_finds_signal(self, trained):
        r, _ = trained
        top = [f for f, _ in r.top_features(3)]
        assert "f0" in top

    def test_save_load_predict_identity(self, trained, tmp_path):
        r, df = trained
        p = str(tmp_path / "gbdt.npz")
        r.save(p)
        r2 = HistGBDTRanker.load(p)
        np.testing.assert_allclose(
            r.predict(df.head(60)), r2.predict(df.head(60)), atol=1e-6
        )

    def test_device_predict_matches_host(self, trained):
        import jax.numpy as jnp

        r, df = trained
        X = df[FEATURES].head(50).values.astype(np.float32)
        host = r.predict(X)
        dev = np.asarray(r.predict_device(jnp.asarray(X)))
        np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)

    def test_untrained_raises(self):
        with pytest.raises(RuntimeError):
            HistGBDTRanker().predict(np.zeros((2, 3)))

    def test_model_info(self, trained):
        r, _ = trained
        info = r.model_info()
        assert info["model_type"] == "hist-gbdt-lambdarank"
        assert info["n_trees"] >= 1


class TestDeviceBackend:
    """Round-5 (verdict r4 #4): the jnp segment-sum tree grower — the
    catalog-scale training path. Must learn equivalently to the numpy
    grower and produce trees the whole predict/save/importance surface
    accepts unchanged."""

    @pytest.fixture(scope="class")
    def pair(self):
        df = make_ranker_data(n_queries=40, group=30)
        valid = make_ranker_data(n_queries=10, seed=1)
        out = {}
        for backend in ("numpy", "device"):
            r = HistGBDTRanker(
                n_estimators=25, learning_rate=0.2, max_depth=4,
                n_bins=32, early_stop_rounds=25, seed=0, backend=backend)
            ev = r.train(df, FEATURES, valid_df=valid, verbose_eval=100)
            out[backend] = (r, ev)
        return out

    def test_device_learns_like_numpy(self, pair):
        ev_np = pair["numpy"][1]["valid_ndcg@10"]
        ev_dev = pair["device"][1]["valid_ndcg@10"]
        assert max(ev_dev) > 0.95 * max(ev_np)
        # and far above random: baseline on this data is ~0.3
        assert max(ev_dev) > 0.5

    def test_device_trees_full_surface(self, pair, tmp_path):
        import jax.numpy as jnp

        r, _ = pair["device"]
        test = make_ranker_data(n_queries=5, seed=7)
        host = r.predict(test)
        dev = np.asarray(
            r.predict_device(jnp.asarray(
                test[FEATURES].values.astype(np.float32))))
        np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)
        p = tmp_path / "gbdt_dev.npz"
        r.save(str(p))
        r2 = HistGBDTRanker.load(str(p))
        np.testing.assert_allclose(r2.predict(test), host, rtol=1e-5)
        assert len(r.feature_importance()) > 0

    def test_min_child_respected(self, pair):
        """Every split in a device-grown tree must carry positive gain
        and in-range feature/threshold ids."""
        r, _ = pair["device"]
        for t in r.trees:
            split = t.feature >= 0
            assert (t.gain[split] > 0).all()
            assert (t.feature[split] < len(FEATURES)).all()
            assert (t.bin_threshold[split] < 32 - 1).all()

    def test_invalid_backend_raises(self):
        with pytest.raises(ValueError):
            HistGBDTRanker(backend="gpu")
