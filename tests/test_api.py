"""HTTP API tests (strategy mirrors reference tests/test_api.py: fully
mocked pipeline with realistic return values driving the app router —
health healthy/degraded, recommend 200/structure/k/ordering, validation
422s, cache fast path, model-info 503-when-unloaded, Prometheus text,
items 404/200)."""
from types import SimpleNamespace
from unittest.mock import MagicMock

import pytest

from recommendit_tpu.serving.app import RecommendItApp, create_app
from recommendit_tpu.serving.recommender import RecommendationResult


def make_mock_pipeline(n_recs: int = 20):
    """MagicMock pipeline with realistic return values (reference
    make_mock_pipeline, tests/test_api.py:20-84)."""
    p = MagicMock()
    p._loaded = True
    p.top_k_candidates = 500
    p.feature_store.stats.return_value = {"backend": "in-memory", "keys": 10}
    p.feature_store.get_cached_recommendations.return_value = None
    results = [
        RecommendationResult(
            item_id=100 + i,
            title=f"Movie {i}",
            score=1.0 - i * 0.01,
            rank=i + 1,
            retrieval_score=0.9 - i * 0.01,
            genres=["Drama"],
        )
        for i in range(n_recs)
    ]
    p.get_recommendations.side_effect = lambda user_id, k, use_cache: results[:k]
    p._popularity_recommendations.side_effect = lambda k: results[:k]
    p.retrieval_latency = SimpleNamespace(p50=2.0)
    p.ranking_latency = SimpleNamespace(p50=3.0)
    p.get_stats.return_value = {"total_requests": 1}
    p.model = SimpleNamespace(embed_dim=64, n_users=600, n_items=400)
    p.index.stats.return_value = {"n_total": 400, "index_type": "exact-mips"}
    p.ranker.model_info.return_value = {"trained": True}
    p._item_titles = {101: "Movie 1"}
    p._item_genres = {101: ["Drama", "Comedy"]}
    return p


@pytest.fixture
def app():
    return RecommendItApp(pipeline=make_mock_pipeline())


@pytest.fixture
def degraded_app():
    return RecommendItApp(pipeline=None)


class TestHealth:
    def test_healthy(self, app):
        status, body, _ = app.handle("GET", "/health")
        assert status == 200
        assert body["status"] == "healthy"
        assert body["pipeline_loaded"] is True
        assert body["feature_store_backend"] == "in-memory"
        assert body["uptime_seconds"] >= 0

    def test_degraded(self, degraded_app):
        status, body, _ = degraded_app.handle("GET", "/health")
        assert status == 200
        assert body["status"] == "degraded"
        assert body["pipeline_loaded"] is False


class TestRecommend:
    def test_basic_200_structure(self, app):
        status, body, _ = app.handle(
            "POST", "/recommend", {"user_id": 1, "k": 5}
        )
        assert status == 200
        assert body["user_id"] == 1
        assert len(body["recommendations"]) == 5
        first = body["recommendations"][0]
        for key in ("item_id", "title", "score", "rank", "retrieval_score",
                    "genres"):
            assert key in first
        assert body["n_candidates"] == 500
        assert body["cache_hit"] is False

    def test_scores_ordered(self, app):
        _, body, _ = app.handle("POST", "/recommend", {"user_id": 1, "k": 10})
        scores = [r["score"] for r in body["recommendations"]]
        assert scores == sorted(scores, reverse=True)
        ranks = [r["rank"] for r in body["recommendations"]]
        assert ranks == list(range(1, 11))

    def test_default_k(self, app):
        _, body, _ = app.handle("POST", "/recommend", {"user_id": 3})
        assert len(body["recommendations"]) == 20

    @pytest.mark.parametrize(
        "payload",
        [
            {"user_id": 0},
            {"user_id": -5},
            {"user_id": "abc"},
            {"k": 10},                       # missing user_id
            {"user_id": 1, "k": 0},
            {"user_id": 1, "k": 101},
            {"user_id": 1, "use_cache": "yes"},
        ],
    )
    def test_validation_422(self, app, payload):
        status, body, _ = app.handle("POST", "/recommend", payload)
        assert status == 422
        assert "detail" in body

    def test_503_when_unloaded(self, degraded_app):
        status, body, _ = degraded_app.handle(
            "POST", "/recommend", {"user_id": 1}
        )
        assert status == 503

    def test_cache_fast_path(self, app):
        cached = [
            {"item_id": 7, "title": "C", "score": 0.5, "rank": 1,
             "retrieval_score": 0.4, "genres": []}
        ]
        app.pipeline.feature_store.get_cached_recommendations.return_value = (
            cached
        )
        status, body, _ = app.handle(
            "POST", "/recommend", {"user_id": 1, "k": 1}
        )
        assert status == 200
        assert body["cache_hit"] is True
        assert body["recommendations"] == cached
        app.pipeline.get_recommendations.assert_not_called()

    def test_use_cache_false_skips_cache(self, app):
        app.pipeline.feature_store.get_cached_recommendations.return_value = [
            {"item_id": 7, "title": "C", "score": 0.5, "rank": 1,
             "retrieval_score": 0.4, "genres": []}
        ]
        _, body, _ = app.handle(
            "POST", "/recommend", {"user_id": 1, "k": 1, "use_cache": False}
        )
        assert body["cache_hit"] is False

    def test_pipeline_exception_degrades_to_popularity(self, app):
        app.pipeline.get_recommendations.side_effect = RuntimeError("boom")
        status, body, _ = app.handle(
            "POST", "/recommend", {"user_id": 1, "k": 3}
        )
        assert status == 200
        assert len(body["recommendations"]) == 3
        app.pipeline._popularity_recommendations.assert_called_once_with(3)


class TestModelInfo:
    def test_info(self, app):
        status, body, _ = app.handle("GET", "/model/info")
        assert status == 200
        assert body["embedding_dim"] == 64
        assert body["index_stats"]["index_type"] == "exact-mips"
        assert body["ranker_info"]["trained"] is True

    def test_503_when_unloaded(self, degraded_app):
        status, _, _ = degraded_app.handle("GET", "/model/info")
        assert status == 503


class TestMetrics:
    def test_prometheus_text(self, app):
        # generate at least one request first
        app.handle("GET", "/health")
        status, body, ctype = app.handle("GET", "/metrics")
        assert status == 200
        assert isinstance(body, str)
        assert "http_requests_total" in body
        assert "text/plain" in ctype


class TestRecommendBatch:
    def test_bulk(self, app):
        app.pipeline.batch_recommend.side_effect = lambda uids, k: {
            u: list(range(100, 100 + k)) for u in uids
        }
        status, body, _ = app.handle(
            "POST", "/recommend/batch", {"user_ids": [1, 2, 3], "k": 4}
        )
        assert status == 200
        assert body["n_users"] == 3
        assert body["recommendations"]["2"] == [100, 101, 102, 103]

    @pytest.mark.parametrize("payload", [
        {},
        {"user_ids": []},
        {"user_ids": [0]},
        {"user_ids": ["a"]},
        {"user_ids": [1], "k": 0},
        {"user_ids": [1], "k": 101},
    ])
    def test_validation(self, app, payload):
        status, _, _ = app.handle("POST", "/recommend/batch", payload)
        assert status == 422

    def test_unloaded_503(self, degraded_app):
        status, _, _ = degraded_app.handle(
            "POST", "/recommend/batch", {"user_ids": [1]}
        )
        assert status == 503


class TestFeatureUpdates:
    def test_user_update_routes_to_pipeline(self, app):
        status, body, _ = app.handle(
            "POST", "/users/7/features", {"avg_rating": 4.2}
        )
        assert status == 200 and body["status"] == "updated"
        app.pipeline.update_user_features.assert_called_once_with(
            7, {"avg_rating": 4.2}
        )

    def test_item_update_routes_to_pipeline(self, app):
        status, _, _ = app.handle(
            "POST", "/items/9/features", {"popularity_score": 0.5}
        )
        assert status == 200
        app.pipeline.update_item_features.assert_called_once()

    def test_empty_body_422(self, app):
        status, _, _ = app.handle("POST", "/users/7/features", {})
        assert status == 422

    def test_bad_id_422(self, app):
        status, _, _ = app.handle("POST", "/users/0/features", {"a": 1})
        assert status == 422

    def test_unloaded_503(self, degraded_app):
        status, _, _ = degraded_app.handle(
            "POST", "/users/7/features", {"a": 1}
        )
        assert status == 503


class TestItems:
    def test_found(self, app):
        status, body, _ = app.handle("GET", "/items/101")
        assert status == 200
        assert body["title"] == "Movie 1"
        assert body["genres"] == ["Drama", "Comedy"]

    def test_not_found(self, app):
        status, body, _ = app.handle("GET", "/items/99999")
        assert status == 404

    def test_unknown_route(self, app):
        status, _, _ = app.handle("GET", "/nope")
        assert status == 404


class TestLiveServer:
    """One end-to-end socket test through the stdlib HTTP server."""

    def test_http_roundtrip(self, app):
        import json
        import threading
        import urllib.request
        from http.server import ThreadingHTTPServer

        from recommendit_tpu.serving.app import make_handler

        server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=5
            ) as resp:
                assert resp.status == 200
                assert json.loads(resp.read())["status"] == "healthy"

            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/recommend",
                data=json.dumps({"user_id": 2, "k": 3}).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=5) as resp:
                body = json.loads(resp.read())
                assert len(body["recommendations"]) == 3

            # malformed JSON → 422
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/recommend",
                data=b"{not json", method="POST",
            )
            try:
                urllib.request.urlopen(req, timeout=5)
                raised = False
            except urllib.error.HTTPError as e:
                raised = e.code == 422
            assert raised
        finally:
            server.shutdown()


class TestAppFactory:
    def test_create_app_degraded_on_load_failure(self, tmp_path):
        from recommendit_tpu.config import Settings

        cfg = Settings(
            EMBEDDING_MODEL_PATH=str(tmp_path / "missing.npz"),
            INDEX_PATH=str(tmp_path / "missing.index"),
            RANKER_MODEL_PATH=str(tmp_path / "missing.ranker"),
        )
        app = create_app(cfg=cfg, load=True)
        status, body, _ = app.handle("GET", "/health")
        assert status == 200
        assert body["status"] == "degraded"
