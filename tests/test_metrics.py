"""Metrics tests (strategy mirrors reference tests/test_models.py:371-443:
perfect/zero/partial NDCG, recall, MRR, coverage, skew positive+negative),
plus equivalence between the per-list and batched-device implementations."""
import numpy as np
import pandas as pd
import pytest

from recommendit_tpu.evaluation.metrics import (
    average_precision,
    batch_rank_metrics,
    coverage,
    detect_training_serving_skew,
    evaluate_model,
    intra_list_diversity,
    kl_divergence_bins,
    mrr,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
)


class TestNDCG:
    def test_perfect(self):
        assert ndcg_at_k([1, 2, 3], [1, 2, 3], 3) == pytest.approx(1.0)

    def test_zero(self):
        assert ndcg_at_k([4, 5, 6], [1, 2, 3], 3) == 0.0

    def test_partial_better_at_top(self):
        hit_first = ndcg_at_k([1, 9, 8], [1, 2, 3], 3)
        hit_last = ndcg_at_k([9, 8, 1], [1, 2, 3], 3)
        assert hit_first > hit_last > 0

    def test_graded(self):
        scores = {1: 3.0, 2: 1.0}
        perfect = ndcg_at_k([1, 2], [1, 2], 2, relevance_scores=scores)
        swapped = ndcg_at_k([2, 1], [1, 2], 2, relevance_scores=scores)
        assert perfect == pytest.approx(1.0)
        assert swapped < 1.0

    def test_empty_relevant(self):
        assert ndcg_at_k([1, 2], [], 2) == 0.0


class TestRecallPrecisionMRR:
    def test_recall(self):
        assert recall_at_k([1, 2, 3, 4], [1, 2, 9, 10], 4) == pytest.approx(0.5)
        assert recall_at_k([1], [], 1) == 0.0

    def test_precision(self):
        assert precision_at_k([1, 2, 3, 4], [1, 2], 4) == pytest.approx(0.5)
        assert precision_at_k([1], [2], 0) == 0.0

    def test_mrr(self):
        assert mrr([9, 8, 1], [1]) == pytest.approx(1 / 3)
        assert mrr([1, 2], [1]) == 1.0
        assert mrr([5, 6], [1]) == 0.0

    def test_ap(self):
        assert average_precision([1, 9, 2], [1, 2]) == pytest.approx(
            (1.0 + 2 / 3) / 2
        )


class TestBatchDeviceMetrics:
    def test_matches_reference_impl(self):
        rng = np.random.default_rng(0)
        n_items, n_users, r, k = 50, 16, 20, 10
        rel = np.zeros((n_users, n_items + 1), dtype=np.int32)
        recs = np.zeros((n_users, r), dtype=np.int32)
        for u in range(n_users):
            rel_ids = rng.choice(np.arange(1, n_items + 1), size=5, replace=False)
            rel[u, rel_ids] = 1
            recs[u] = rng.choice(np.arange(1, n_items + 1), size=r, replace=False)

        out = batch_rank_metrics(recs, rel, k)
        for u in range(n_users):
            relevant = list(np.nonzero(rel[u])[0])
            assert float(out["ndcg"][u]) == pytest.approx(
                ndcg_at_k(list(recs[u]), relevant, k), abs=1e-5
            )
            assert float(out["recall"][u]) == pytest.approx(
                recall_at_k(list(recs[u]), relevant, k), abs=1e-5
            )
            assert float(out["mrr"][u]) == pytest.approx(
                mrr(list(recs[u]), relevant), abs=1e-5
            )


class TestCoverageDiversity:
    def test_coverage(self):
        assert coverage([[1, 2], [2, 3]], 10) == pytest.approx(0.3)
        assert coverage([], 0) == 0.0

    def test_diversity(self):
        vecs = {1: np.array([1.0, 0.0]), 2: np.array([0.0, 1.0]),
                3: np.array([1.0, 0.0])}
        d = intra_list_diversity([1, 2, 3], vecs)
        assert 0 < d < 1
        assert intra_list_diversity([1], vecs) == 0.0
        # identical vectors -> zero diversity
        assert intra_list_diversity([1, 3], vecs) == pytest.approx(0.0, abs=1e-9)


class TestSkew:
    def test_no_skew(self):
        rng = np.random.default_rng(0)
        a = pd.DataFrame({"x": rng.normal(size=5000)})
        b = pd.DataFrame({"x": rng.normal(size=5000)})
        res = detect_training_serving_skew(a, b, threshold=0.1)
        assert not res["skew_detected"]

    def test_skew_detected(self):
        rng = np.random.default_rng(0)
        a = pd.DataFrame({"x": rng.normal(0, 1, size=5000)})
        b = pd.DataFrame({"x": rng.normal(5, 1, size=5000)})
        res = detect_training_serving_skew(a, b, threshold=0.1)
        assert res["skew_detected"]
        assert "x" in res["flagged_features"]

    def test_kl_identical_zero(self):
        v = np.ones(100)
        assert kl_divergence_bins(v, v) == 0.0

    def test_small_samples_skipped(self):
        a = pd.DataFrame({"x": [1.0, 2.0]})
        b = pd.DataFrame({"x": [1.0, 2.0]})
        res = detect_training_serving_skew(a, b)
        assert res["n_features_checked"] == 0


class TestEvaluateModel:
    def test_report_shape(self):
        recs = {1: [10, 11, 12], 2: [20, 21, 22]}
        truth = {1: [10], 2: [99]}
        report = evaluate_model(recs, truth, k_values=[1, 3], catalog_size=100)
        assert report["n_users"] == 2
        assert "ndcg@1" in report and "recall@3" in report and "mrr" in report
        assert 0 <= report["coverage"] <= 1

    def test_empty(self):
        assert evaluate_model({}, {})["n_users"] == 0
