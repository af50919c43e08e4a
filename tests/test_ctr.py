"""Criteo-style CTR config tests (BASELINE config #5).

Strategy mirrors the reference's test style (SURVEY.md §4): seeded
synthetic fixtures, invariant checks, loss-decreases / quality-improves
smoke training, save/load identity — plus an 8-device sharded-step
equivalence test the reference has no analogue for.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from recommendit_tpu.config import settings
from recommendit_tpu.data.ctr import (
    N_DENSE,
    N_SPARSE,
    N_USER_FIELDS,
    make_ctr_dataset,
)
from recommendit_tpu.evaluation.metrics import binary_auc, binary_logloss
from recommendit_tpu.models.ctr import (
    CTRModel,
    bce_loss,
    ctr_forward,
    field_offsets,
    init_ctr_params,
    weighted_in_batch_softmax,
)
from recommendit_tpu.training.train_ctr import CTRTrainer


@pytest.fixture(scope="module")
def ctr_data():
    return make_ctr_dataset(
        n_examples=12000, n_users=300, n_items=150, seed=7
    )


# ------------------------------------------------------------------ #
# Data generator                                                       #
# ------------------------------------------------------------------ #


class TestCTRDataset:
    def test_shapes_and_dtypes(self, ctr_data):
        d = ctr_data
        assert d.dense.shape == (12000, N_DENSE)
        assert d.sparse.shape == (12000, N_SPARSE)
        assert d.dense.dtype == np.float32
        assert d.sparse.dtype == np.int32
        assert len(d.vocab_sizes) == N_SPARSE
        assert d.user_field_values.shape == (300, N_USER_FIELDS)
        assert d.item_field_values.shape == (150, N_SPARSE - N_USER_FIELDS)

    def test_ids_within_vocab(self, ctr_data):
        d = ctr_data
        for f in range(N_SPARSE):
            assert d.sparse[:, f].min() >= 0
            assert d.sparse[:, f].max() < d.vocab_sizes[f]

    def test_id_fields_identify_entities(self, ctr_data):
        d = ctr_data
        assert np.array_equal(d.sparse[:, 0], d.user_ids)
        assert np.array_equal(d.sparse[:, N_USER_FIELDS], d.item_ids)

    def test_ctr_calibrated(self, ctr_data):
        assert 0.18 < ctr_data.labels.mean() < 0.32

    def test_deterministic(self):
        a = make_ctr_dataset(n_examples=500, n_users=50, n_items=30, seed=3)
        b = make_ctr_dataset(n_examples=500, n_users=50, n_items=30, seed=3)
        assert np.array_equal(a.dense, b.dense)
        assert np.array_equal(a.sparse, b.sparse)
        assert np.array_equal(a.labels, b.labels)

    def test_dense_finite(self, ctr_data):
        assert np.isfinite(ctr_data.dense).all()

    def test_split_is_temporal_tail(self, ctr_data):
        tr, te = ctr_data.split(0.1)
        assert len(te.labels) == 1200
        assert np.array_equal(
            np.concatenate([tr.labels, te.labels]), ctr_data.labels
        )


# ------------------------------------------------------------------ #
# Model                                                                #
# ------------------------------------------------------------------ #


class TestCTRModel:
    def test_forward_shapes(self, ctr_data):
        m = CTRModel(ctr_data.vocab_sizes, embed_dim=8, top_hidden=(32,))
        ids = m.stack_ids(ctr_data.sparse[:64])
        logits = ctr_forward(
            m.params, jnp.asarray(ctr_data.dense[:64]), jnp.asarray(ids)
        )
        assert logits.shape == (64,)
        assert np.isfinite(np.asarray(logits)).all()

    def test_joint_forward(self, ctr_data):
        m = CTRModel(ctr_data.vocab_sizes, embed_dim=8, retrieval_dim=16,
                     top_hidden=(32,))
        ids = m.stack_ids(ctr_data.sparse[:32])
        logits, ue, ie = ctr_forward(
            m.params, jnp.asarray(ctr_data.dense[:32]), jnp.asarray(ids),
            joint=True,
        )
        assert logits.shape == (32,)
        assert ue.shape == (32, 16) and ie.shape == (32, 16)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(ue), axis=1), 1.0, atol=1e-5
        )

    def test_stacked_offsets_disjoint(self, ctr_data):
        off = field_offsets(ctr_data.vocab_sizes)
        ends = off + np.asarray(ctr_data.vocab_sizes)
        assert (off[1:] == ends[:-1]).all()  # contiguous, non-overlapping

    def test_untrained_auc_near_half(self, ctr_data):
        m = CTRModel(ctr_data.vocab_sizes, embed_dim=8, top_hidden=(32,))
        probs = m.predict_proba(ctr_data.dense[:4000], ctr_data.sparse[:4000])
        auc = binary_auc(ctr_data.labels[:4000], probs)
        assert 0.35 < auc < 0.65

    def test_bce_loss_matches_optax(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal(256), jnp.float32)
        labels = jnp.asarray((rng.random(256) < 0.3).astype(np.float32))
        ours = float(bce_loss(logits, labels))
        ref = float(optax.sigmoid_binary_cross_entropy(logits, labels).mean())
        assert abs(ours - ref) < 1e-6

    def test_weighted_softmax_only_counts_clicks(self):
        rng = jax.random.PRNGKey(0)
        u = jax.random.normal(rng, (16, 8))
        v = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
        w = jnp.zeros(16).at[3].set(1.0)
        loss = weighted_in_batch_softmax(u, v, w, temperature=1.0)
        scores = u @ v.T
        expect = -jax.nn.log_softmax(scores, axis=1)[3, 3]
        assert abs(float(loss) - float(expect)) < 1e-5

    def test_pad_rows_to(self, ctr_data):
        p = init_ctr_params(jax.random.PRNGKey(0), ctr_data.vocab_sizes,
                            embed_dim=8, pad_rows_to=8)
        assert p["embed"].shape[0] % 8 == 0

    def test_save_load_identity(self, ctr_data, tmp_path):
        m = CTRModel(ctr_data.vocab_sizes, embed_dim=8, top_hidden=(32,))
        path = str(tmp_path / "ctr.npz")
        m.save(path)
        m2 = CTRModel.load(path)
        p1 = m.predict_proba(ctr_data.dense[:128], ctr_data.sparse[:128])
        p2 = m2.predict_proba(ctr_data.dense[:128], ctr_data.sparse[:128])
        np.testing.assert_array_equal(p1, p2)


# ------------------------------------------------------------------ #
# Training                                                             #
# ------------------------------------------------------------------ #


@pytest.fixture(scope="module")
def trained(ctr_data):
    cfg = settings.replace(
        CTR_EPOCHS=6, CTR_BATCH_SIZE=1024, CTR_EMBED_DIM=8,
        CTR_RETRIEVAL_DIM=16, CTR_TOP_HIDDEN=(64,),
    )
    tr = CTRTrainer(ctr_data, cfg=cfg, joint=True)
    tr.train()
    return tr


class TestCTRTraining:
    def test_loss_decreases(self, trained):
        losses = [h["loss"] for h in trained.history]
        assert losses[-1] < losses[0]

    def test_auc_beats_random(self, trained):
        rep = trained.evaluate()
        assert rep["auc"] > 0.55
        assert rep["logloss"] < binary_logloss(
            trained.test_data.labels,
            np.full_like(trained.test_data.labels,
                         trained.train_data.labels.mean()),
        ) + 0.05

    def test_joint_retrieval_beats_random(self, trained):
        rep = trained.evaluate(recall_ks=(10,))
        # random recall@10 over 150 items = 0.067
        assert rep["recall@10"] > 0.2

    def test_plain_mode_trains(self, ctr_data):
        cfg = settings.replace(CTR_EPOCHS=2, CTR_BATCH_SIZE=1024,
                               CTR_EMBED_DIM=8, CTR_TOP_HIDDEN=(32,))
        tr = CTRTrainer(ctr_data, cfg=cfg, joint=False)
        tr.train()
        rep = tr.evaluate()
        assert "recall@10" not in rep
        assert np.isfinite(rep["logloss"])


# ------------------------------------------------------------------ #
# Distributed step (8-device virtual mesh)                             #
# ------------------------------------------------------------------ #


class TestCTRSharded:
    @pytest.fixture(scope="class")
    def mesh(self):
        from recommendit_tpu.parallel.mesh import create_mesh

        return create_mesh(shape=(2, 4))

    def test_sharded_step_matches_single_device(self, ctr_data, mesh):
        from recommendit_tpu.parallel.ctr import (
            init_ctr_sharded_state,
            make_ctr_sharded_train_step,
        )

        n_model = mesh.shape["model"]
        params = init_ctr_params(
            jax.random.PRNGKey(0), ctr_data.vocab_sizes, embed_dim=8,
            top_hidden=(32,), retrieval_dim=16, pad_rows_to=n_model,
        )
        tx = optax.sgd(0.1)
        m = CTRModel(ctr_data.vocab_sizes, embed_dim=8)
        ids = m.stack_ids(ctr_data.sparse[:256])
        batch = (
            jnp.asarray(ctr_data.dense[:256]),
            jnp.asarray(ids),
            jnp.asarray(ctr_data.labels[:256]),
        )

        # single-device reference step
        from recommendit_tpu.models.ctr import (
            ctr_forward_from_embed,
            embed_fields,
            item_tower_ctr,
            user_tower_ctr,
        )

        def ref_loss(p, dense, sids, labels):
            rows = embed_fields(p, sids)
            ue = user_tower_ctr(p, rows[:, :N_USER_FIELDS])
            ie = item_tower_ctr(p, rows[:, N_USER_FIELDS:])
            sim = jnp.sum(ue * ie, axis=-1)
            logits = ctr_forward_from_embed(p, dense, rows, sim)
            ret = weighted_in_batch_softmax(ue, ie, labels, temperature=0.1)
            return bce_loss(logits, labels) + 0.5 * ret

        ref_l, ref_g = jax.value_and_grad(ref_loss)(params, *batch)
        # compute the reference update BEFORE the donating sharded step:
        # on the virtual CPU mesh device_put may alias the source buffers,
        # so donation would delete `params` out from under us
        expect = optax.apply_updates(
            params, tx.update(ref_g, tx.init(params), params)[0]
        )

        sp, so = init_ctr_sharded_state(mesh, tx, params)
        step = make_ctr_sharded_train_step(
            mesh, tx, N_USER_FIELDS, joint=True,
            retrieval_weight=0.5, temperature=0.1,
        )
        new_p, _, loss = step(sp, so, batch)
        assert abs(float(loss) - float(ref_l)) < 1e-4
        for k in ("embed", "top_w1", "bot_w1", "ut_w1"):
            np.testing.assert_allclose(
                np.asarray(new_p[k]), np.asarray(expect[k]),
                rtol=2e-4, atol=2e-5,
            )

    def test_table_stays_sharded(self, ctr_data, mesh):
        from recommendit_tpu.parallel.ctr import (
            ctr_params_shardings,
            init_ctr_sharded_state,
            make_ctr_sharded_train_step,
        )

        params = init_ctr_params(
            jax.random.PRNGKey(1), ctr_data.vocab_sizes, embed_dim=8,
            top_hidden=(32,), retrieval_dim=16,
            pad_rows_to=mesh.shape["model"],
        )
        tx = optax.adam(1e-3)
        sp, so = init_ctr_sharded_state(mesh, tx, params)
        step = make_ctr_sharded_train_step(mesh, tx, N_USER_FIELDS)
        m = CTRModel(ctr_data.vocab_sizes, embed_dim=8)
        ids = m.stack_ids(ctr_data.sparse[:128])
        batch = (
            jnp.asarray(ctr_data.dense[:128]),
            jnp.asarray(ids),
            jnp.asarray(ctr_data.labels[:128]),
        )
        for _ in range(2):
            sp, so, loss = step(sp, so, batch)
        want = ctr_params_shardings(params, mesh)["embed"]
        assert sp["embed"].sharding.is_equivalent_to(want, sp["embed"].ndim)
        assert np.isfinite(float(loss))


class TestSparseEmbedUpdate:
    """ops.sparse_embed: mixed per-field row-adagrad == reference math."""

    def _setup(self, seed=0):
        rng = np.random.default_rng(seed)
        vocab = (50, 7, 3000)   # fields 0,1 small; field 2 large (thr=100)
        rows = sum(vocab)
        table = jnp.asarray(rng.standard_normal((rows, 4)), jnp.float32)
        accum = jnp.zeros((rows,), jnp.float32)
        offs = np.concatenate([[0], np.cumsum(vocab)[:-1]])
        b = 16
        raw = np.stack([rng.integers(0, v, size=b) for v in vocab], 1)
        raw[0, 0] = raw[1, 0]  # force a duplicate id in a small field
        raw[2, 2] = raw[3, 2]  # and in the large field
        ids = jnp.asarray(raw + offs[None, :], jnp.int32)
        grads = jnp.asarray(rng.standard_normal((b, 3, 4)), jnp.float32)
        return vocab, table, accum, ids, grads

    def test_matches_dedup_adagrad_reference(self):
        from recommendit_tpu.ops.sparse_embed import sparse_table_update

        vocab, table, accum, ids, grads = self._setup()
        lr, eps = 0.05, 1e-8
        new_table, new_accum = jax.jit(
            lambda t, a, i, g: sparse_table_update(
                t, a, i, g, vocab, lr=lr, small_threshold=100, eps=eps
            )
        )(table, accum, ids, grads)

        # reference math per the op's documented duplicate-id semantics:
        # weight delta = -scale * summed grad in both paths; accumulator =
        # mean((sum g)^2) for small fields, sum of mean(g_i^2) for large
        t_ref = np.asarray(table).copy()
        a_ref = np.asarray(accum).copy()
        ids_np = np.asarray(ids)
        g_np = np.asarray(grads)
        for f in range(3):
            uniq, inv = np.unique(ids_np[:, f], return_inverse=True)
            g = np.zeros((len(uniq), 4), np.float32)
            np.add.at(g, inv, g_np[:, f, :])
            if vocab[f] <= 100:  # small field: summed-gradient accumulator
                a_ref[uniq] += np.mean(g * g, axis=1)
            else:  # large field: per-example accumulator
                per_ex = np.zeros(len(uniq), np.float32)
                np.add.at(per_ex, inv, np.mean(g_np[:, f, :] ** 2, axis=1))
                a_ref[uniq] += per_ex
            t_ref[uniq] -= (lr / (np.sqrt(a_ref[uniq]) + eps))[:, None] * g
        np.testing.assert_allclose(np.asarray(new_table), t_ref,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_accum), a_ref,
                                   rtol=1e-4, atol=1e-6)

    def test_untouched_rows_unchanged(self):
        from recommendit_tpu.ops.sparse_embed import sparse_table_update

        vocab, table, accum, ids, grads = self._setup(seed=1)
        new_table, _ = sparse_table_update(
            table, accum, ids, grads, vocab, small_threshold=100
        )
        touched = set(np.asarray(ids).ravel().tolist())
        # small-field slices are rewritten wholesale but with zero grad the
        # rows must be numerically unchanged; check a large-field row
        large_off = 57  # fields (50, 7) before the large field
        untouched = [
            r for r in range(large_off, sum(vocab)) if r not in touched
        ][:20]
        np.testing.assert_array_equal(
            np.asarray(new_table)[untouched], np.asarray(table)[untouched]
        )

    def test_trainer_sparse_mode_quality(self, ctr_data):
        from recommendit_tpu.training.train_ctr import CTRTrainer

        cfg = settings.replace(
            CTR_EPOCHS=6, CTR_BATCH_SIZE=1024, CTR_EMBED_DIM=8,
            CTR_RETRIEVAL_DIM=16, CTR_TOP_HIDDEN=(64,),
            CTR_TABLE_UPDATE="sparse",
        )
        tr = CTRTrainer(ctr_data, cfg=cfg, joint=True)
        tr.train()
        losses = [h["loss"] for h in tr.history]
        assert losses[-1] < losses[0]
        rep = tr.evaluate(recall_ks=(10,))
        assert rep["auc"] > 0.55
        assert rep["recall@10"] > 0.2
