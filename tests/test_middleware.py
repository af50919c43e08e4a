"""Prometheus middleware tests: metric recording, endpoint normalization,
error counters."""
import pytest

from recommendit_tpu.serving import middleware
from recommendit_tpu.serving.middleware import (
    normalize_endpoint,
    record_recommendation_metrics,
    track_request,
)


class TestNormalizeEndpoint:
    @pytest.mark.parametrize("path,expected", [
        ("/recommend", "/recommend"),
        ("/recommend?x=1", "/recommend"),
        ("/health", "/health"),
        ("/metrics", "/metrics"),
        ("/model/info", "/model/info"),
        ("/items/12345", "/items/{item_id}"),
        ("/other", "/other"),
    ])
    def test_bounded_cardinality(self, path, expected):
        assert normalize_endpoint(path) == expected


class TestTrackRequest:
    def test_records_success(self):
        status, body = track_request("GET", "/health", lambda: (200, {"ok": 1}))
        assert status == 200 and body == {"ok": 1}
        text = middleware.generate_latest().decode()
        assert 'http_requests_total{endpoint="/health"' in text

    def test_error_counted_and_reraised(self):
        with pytest.raises(ValueError):
            track_request("POST", "/recommend",
                          lambda: (_ for _ in ()).throw(ValueError("x")))
        text = middleware.generate_latest().decode()
        assert 'recommendation_errors_total{error_type="ValueError"}' in text


class TestRecommendationMetrics:
    def test_histograms_and_cache_counters(self):
        record_recommendation_metrics(
            latency_ms=12.0, retrieval_ms=2.0, ranking_ms=3.0,
            n_candidates=500, cache_hit=False,
        )
        record_recommendation_metrics(
            latency_ms=0.1, retrieval_ms=0.0, ranking_ms=0.0,
            n_candidates=0, cache_hit=True,
        )
        text = middleware.generate_latest().decode()
        assert "recommendation_latency_ms_bucket" in text
        assert "recommendation_cache_hits_total" in text
        assert "candidates_retrieved_total" in text
