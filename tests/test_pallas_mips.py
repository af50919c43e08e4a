"""Fused Pallas MIPS kernel tests (interpreter mode on CPU; the real-TPU
compile/perf path is exercised by bench.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from recommendit_tpu.ops.pallas_mips import mips_topk_fused
from recommendit_tpu.ops.topk import mips_topk_numpy


def _run(Q, N, D, K, R, block=1024, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(Q, D)), jnp.float32)
    items = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    v, i = mips_topk_fused(q, items, K, block, R, True)
    return np.asarray(q), np.asarray(items), np.asarray(v), np.asarray(i)


class TestFusedMIPS:
    def test_values_match_indices(self):
        q, items, v, i = _run(8, 5000, 32, 100, 8)
        gathered = np.take_along_axis(q @ items.T, i, axis=1)
        np.testing.assert_allclose(gathered, v, atol=1e-4)

    def test_sorted_descending(self):
        _, _, v, _ = _run(8, 4096, 16, 64, 8)
        assert (np.diff(v, axis=1) <= 1e-6).all()

    def test_indices_in_bounds_with_padding(self):
        """Non-power-of-two corpus exercises the bias-coordinate padding."""
        _, _, v, i = _run(8, 3001, 16, 100, 4)
        assert (i >= 0).all() and (i < 3001).all()
        assert np.isfinite(v).all()

    def test_recall_matches_bin_model(self):
        q, items, v, i = _run(16, 8192, 32, 100, 8)
        _, idxn = mips_topk_numpy(q, items, 100)
        recall = np.mean([
            len(set(i[r].tolist()) & set(idxn[r].tolist())) / 100
            for r in range(16)
        ])
        # bin model: per-item loss ≈ k*R/(2N) → recall ≈ 1 - 100*8/16384 ≈ .95
        assert recall > 0.85

    def test_reduction_one_is_exact(self):
        q, items, v, i = _run(4, 2048, 16, 50, 1)
        vn, idxn = mips_topk_numpy(q, items, 50)
        np.testing.assert_array_equal(i, idxn)
        np.testing.assert_allclose(v, vn, rtol=1e-4)

    def test_k_exceeds_candidates_raises(self):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(1024, 16)), jnp.float32)
        with pytest.raises(ValueError):
            mips_topk_fused(q, items, 200, 1024, 32, True)  # N/R=32 < 200

    def test_no_duplicate_indices(self):
        _, _, _, i = _run(8, 4096, 32, 200, 4)
        for row in i:
            assert len(set(row.tolist())) == len(row)
