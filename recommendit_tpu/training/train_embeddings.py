"""Two-tower embedding training — scan-based epochs on device.

Capability parity with the reference trainer
(``src/training/train_embeddings.py``): positives = ratings >= 4 (:43),
Adam + weight decay 1e-5 (:160), cosine LR schedule (:161), grad-clip 1.0
(:191), per-epoch best-loss checkpointing (:208-211), post-train catalog
embedding precompute (:213-220).

TPU-first design differences:
* The whole epoch is one jitted ``lax.scan`` over batches — no Python
  per-batch loop, no DataLoader processes; batches are a device-resident
  (n_batches, B) index array.
* Default loss is the fused in-batch BPR (every other in-batch item is a
  negative) rather than 1 rejection-sampled negative per positive — far
  higher effective negative count per FLOP on the MXU. ``loss_mode=
  'pairwise'`` reproduces the reference's explicit-negative objective with
  vectorized uniform negatives resampled per epoch.
* Full train state (params + opt state) checkpoints via Orbax → true
  resume (the reference cannot resume mid-training).
"""
from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from recommendit_tpu.config import Settings, settings as default_settings
from recommendit_tpu.data.movielens import MovieLensData
from recommendit_tpu.features.schema import encode_genres_matrix
from recommendit_tpu.models.two_tower import (
    TwoTowerModel,
    init_params,
    item_tower,
    user_tower,
)
from recommendit_tpu.ops.bpr import (
    in_batch_bpr_loss_xla,
    in_batch_bpr_pallas,
    in_batch_softmax_loss,
    pairwise_bpr_loss,
)
from recommendit_tpu.utils.checkpoint import save_train_state

logger = logging.getLogger(__name__)


def build_genre_table(movies_df, n_items: int) -> np.ndarray:
    """(n_items+1, 18) genre multi-hot lookup, row 0 = padding."""
    table = np.zeros((n_items + 1, 18), dtype=np.float32)
    ids = movies_df["item_id"].values.astype(np.int64)
    mat = encode_genres_matrix(movies_df["genres"].values)
    ok = (ids >= 1) & (ids <= n_items)
    table[ids[ok]] = mat[ok]
    return table


def warm_start_item_bias(pos_items: np.ndarray, n_items: int) -> np.ndarray:
    """(n_items+1,) initial per-item score bias = centered empirical
    log-popularity.

    The bias's MLE target under the logQ-corrected softmax IS the
    user-independent part of log p(i|u) ≈ log-popularity, but SGD reaches
    it at a rate proportional to each item's sampling frequency — rare
    items stay near zero for the whole cosine-LR schedule (measured:
    trained-from-zero bias plateaued at ~0.2 sd vs the ~1.0 sd optimum).
    Warm-starting lets training only refine quality deviations."""
    counts = np.bincount(pos_items, minlength=n_items + 1)
    p = counts / max(1, counts.sum())
    log_q = np.log(np.maximum(p, 1e-12)).astype(np.float32)
    seen = counts > 0
    floor = log_q[seen].min() if seen.any() else 0.0
    b0 = np.where(seen, log_q, floor)
    b0 = b0 - b0[1:].mean()  # center (row 0 is padding)
    b0[0] = 0.0
    return b0.astype(np.float32)


class EmbeddingTrainer:
    """Trains the two-tower model on (user, positive-item) interactions."""

    def __init__(
        self,
        data: MovieLensData,
        cfg: Optional[Settings] = None,
        loss_mode: Optional[str] = None,
        model_output_path: Optional[str] = None,
        ckpt_dir: Optional[str] = None,
    ):
        self.cfg = cfg or default_settings
        self.data = data
        self.loss_mode = loss_mode or self.cfg.LOSS_MODE
        # None -> config default; '' -> saving explicitly disabled
        self.model_output_path = (
            self.cfg.EMBEDDING_MODEL_PATH if model_output_path is None
            else model_output_path
        )
        self.ckpt_dir = ckpt_dir
        self.history: List[Dict] = []

        self.n_users = data.n_users
        self.n_items = data.n_items
        r = data.ratings
        pos = r[r["rating"] >= 4]
        self.pos_users = pos["user_id"].values.astype(np.int32)
        self.pos_items = pos["item_id"].values.astype(np.int32)
        self.genre_table = build_genre_table(data.movies, self.n_items)
        # rated set for pairwise rejection sampling — CSR sorted-key set,
        # 4 B/rating at any scale (round 1 used a dense bool table capped
        # at 5e7 cells, which silently skipped rejection at ML-25M shapes)
        from recommendit_tpu.ops.seen import SeenSet

        self._rated = SeenSet(
            r["user_id"].values, r["item_id"].values, self.n_items
        )
        logger.info(
            "Trainer: %d positives, %d users, %d items, loss=%s",
            len(self.pos_users), self.n_users, self.n_items, loss_mode,
        )

    # ------------------------------------------------------------------ #

    def _make_step(self, tx, use_pallas: bool, genre_table):
        cfg = self.cfg
        loss_mode = self.loss_mode

        log_q_table = jnp.asarray(self._log_q_table())
        cdt = jnp.bfloat16 if cfg.COMPUTE_DTYPE == "bfloat16" else None

        def loss_fn(params, batch, rng):
            k1, k2 = jax.random.split(rng)
            u_ids, i_ids, n_ids = batch
            ue = user_tower(params, u_ids, cfg.DROPOUT, k1, cdt)
            ie = item_tower(
                params, i_ids, jnp.take(genre_table, i_ids, axis=0),
                cfg.DROPOUT, k2, cdt,
            )
            if loss_mode == "pairwise":
                ne = item_tower(
                    params, n_ids, jnp.take(genre_table, n_ids, axis=0),
                    cfg.DROPOUT, k2, cdt,
                )
                return pairwise_bpr_loss(ue, ie, ne)
            if loss_mode == "softmax":
                return in_batch_softmax_loss(
                    ue, ie, jnp.take(log_q_table, i_ids),
                    cfg.SOFTMAX_TEMPERATURE,
                    item_bias=jnp.take(params["item_bias"], i_ids),
                )
            if use_pallas:
                return in_batch_bpr_pallas(ue, ie)
            return in_batch_bpr_loss_xla(ue, ie)

        def step(carry, batch):
            params, opt_state, rng = carry
            rng, sub = jax.random.split(rng)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, sub)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), loss

        if self.cfg.TRAIN_JIT_SCOPE == "chunk":
            # jitted scan over fixed-size batch chunks: one dispatch per
            # CHUNK batches (amortizes the host/tunnel RTT) with an XLA
            # program CHUNK/n_batches the size of the epoch scan. The
            # remainder (< CHUNK batches) runs through the same program
            # shape-family — at most 2 compiles per run.
            chunk = max(1, self.cfg.TRAIN_CHUNK_BATCHES)

            def scan_chunk(carry, batches):
                return jax.lax.scan(step, carry, batches)

            jit_chunk = jax.jit(scan_chunk, donate_argnums=(0,))

            def epoch_fn(params, opt_state, batches, rng):
                n = batches[0].shape[0]
                carry = (params, opt_state, rng)
                losses = []
                for s in range(0, n, chunk):
                    cb = jax.tree_util.tree_map(
                        lambda x: x[s: s + chunk], batches
                    )
                    carry, ls = jit_chunk(carry, cb)
                    losses.append(ls)
                params, opt_state, rng = carry
                return params, opt_state, rng, jnp.mean(
                    jnp.concatenate(losses)
                )

            return epoch_fn

        if self.cfg.TRAIN_JIT_SCOPE == "step":
            # per-batch jit: a much smaller XLA program than the epoch
            # scan — the workaround for remote-compile toolchains that
            # hang on the scan (ROADMAP §3). Python loops over batches.
            jit_step = jax.jit(step, donate_argnums=(0,))

            def epoch_fn(params, opt_state, batches, rng):
                n = batches[0].shape[0]
                carry = (params, opt_state, rng)
                losses = []
                for b in range(n):
                    batch = jax.tree_util.tree_map(lambda x: x[b], batches)
                    carry, loss = jit_step(carry, batch)
                    losses.append(loss)
                params, opt_state, rng = carry
                return params, opt_state, rng, jnp.mean(jnp.stack(losses))

            return epoch_fn

        def epoch_fn(params, opt_state, batches, rng):
            (params, opt_state, rng), losses = jax.lax.scan(
                step, (params, opt_state, rng), batches
            )
            return params, opt_state, rng, jnp.mean(losses)

        return jax.jit(epoch_fn, donate_argnums=(0, 1))

    def _log_q_table(self) -> np.ndarray:
        """(n_items+1,) log empirical sampling probability of each item in
        the positive stream (for logQ-corrected sampled softmax)."""
        counts = np.bincount(self.pos_items, minlength=self.n_items + 1)
        p = counts / max(1, counts.sum())
        return np.log(np.maximum(p, 1e-12)).astype(np.float32)

    def _epoch_batches(self, rng: np.random.Generator, batch_size: int):
        """Shuffle positives, drop remainder, optionally sample negatives."""
        n = len(self.pos_users)
        perm = rng.permutation(n)
        n_batches = n // batch_size
        take = n_batches * batch_size
        u = self.pos_users[perm[:take]].reshape(n_batches, batch_size)
        i = self.pos_items[perm[:take]].reshape(n_batches, batch_size)
        if self.loss_mode == "pairwise":
            neg = rng.integers(1, self.n_items + 1, size=(n_batches, batch_size))
            for _ in range(4):  # a few rejection rounds suffice
                bad = self._rated.contains(u, neg)
                if not bad.any():
                    break
                neg[bad] = rng.integers(1, self.n_items + 1, size=int(bad.sum()))
            neg = neg.astype(np.int32)
        else:
            neg = np.zeros_like(u)
        return u, i, neg

    # ------------------------------------------------------------------ #

    def train(
        self,
        epochs: Optional[int] = None,
        resume_from: Optional[str] = None,
    ) -> TwoTowerModel:
        """Train; ``resume_from`` restores a full train state (params +
        optimizer moments + epoch) written by the per-epoch checkpointing —
        genuine mid-training resume, which the reference cannot do
        (SURVEY.md §5.4)."""
        cfg = self.cfg
        epochs = epochs or cfg.TRAIN_EPOCHS
        batch_size = min(cfg.BATCH_SIZE, max(8, len(self.pos_users) // 2))
        n_batches = max(1, len(self.pos_users) // batch_size)
        use_pallas = cfg.USE_PALLAS and jax.devices()[0].platform == "tpu"

        params = init_params(
            jax.random.PRNGKey(cfg.SEED), self.n_users, self.n_items,
            cfg.EMBEDDING_DIM, cfg.HIDDEN_DIM,
        )
        if self.loss_mode == "softmax":
            params["item_bias"] = jnp.asarray(
                warm_start_item_bias(self.pos_items, self.n_items)
            )
        schedule = optax.cosine_decay_schedule(
            cfg.LEARNING_RATE, decay_steps=max(1, epochs * n_batches)
        )
        # no weight decay on the bias: decay pulls it toward 0, which is a
        # popularity-bias regression, not regularization (it is 1 scalar
        # per item — the capacity weight decay exists to control is absent)
        wd_mask = {k: k != "item_bias" for k in params}
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.GRAD_CLIP_NORM),
            optax.adamw(schedule, weight_decay=cfg.WEIGHT_DECAY,
                        mask=wd_mask),
        )
        opt_state = tx.init(params)

        start_epoch = 1
        if resume_from:
            from recommendit_tpu.utils.checkpoint import load_train_state

            template = {
                "params": params, "opt_state": opt_state,
                "epoch": jnp.asarray(0), "loss": jnp.asarray(0.0),
            }
            state = load_train_state(resume_from, template=template)
            params = state["params"]
            opt_state = state["opt_state"]
            start_epoch = int(state["epoch"]) + 1
            logger.info(
                "Resumed from %s at epoch %d (loss %.4f)",
                resume_from, start_epoch - 1, float(state["loss"]),
            )
        genre_table = jnp.asarray(self.genre_table)
        epoch_fn = self._make_step(tx, use_pallas, genre_table)

        host_rng = np.random.default_rng(cfg.SEED)
        rng = jax.random.PRNGKey(cfg.SEED + 1)
        best_loss = float("inf")
        best_params = params
        total_examples = 0
        t_train = time.time()

        logger.info(
            "Training: %d epochs x %d batches x %d batch (%s, pallas=%s)",
            epochs, n_batches, batch_size, self.loss_mode, use_pallas,
        )
        for epoch in range(start_epoch, epochs + 1):
            t0 = time.time()
            u, i, neg = self._epoch_batches(host_rng, batch_size)
            batches = (jnp.asarray(u), jnp.asarray(i), jnp.asarray(neg))
            params, opt_state, rng, loss = epoch_fn(params, opt_state, batches, rng)
            loss = float(loss)
            dt = time.time() - t0
            n_ex = u.size
            total_examples += n_ex
            self.history.append(
                {"epoch": epoch, "loss": loss, "seconds": dt,
                 "examples_per_s": n_ex / dt}
            )
            logger.info(
                "epoch %d/%d | loss %.4f | %.2fs | %.0f ex/s",
                epoch, epochs, loss, dt, n_ex / dt,
            )
            if loss < best_loss:
                best_loss = loss
                best_params = jax.tree_util.tree_map(lambda x: x.copy(), params)
                if self.ckpt_dir:
                    save_train_state(
                        str(Path(self.ckpt_dir) / "best"),
                        {"params": params, "opt_state": opt_state,
                         "epoch": jnp.asarray(epoch), "loss": jnp.asarray(loss)},
                    )

        elapsed = time.time() - t_train
        self.examples_per_s = total_examples / elapsed
        logger.info(
            "Training done in %.1fs (best loss %.4f, %.0f examples/s)",
            elapsed, best_loss, self.examples_per_s,
        )

        model = TwoTowerModel(
            n_users=self.n_users, n_items=self.n_items,
            embed_dim=cfg.EMBEDDING_DIM, hidden_dim=cfg.HIDDEN_DIM,
            dropout=cfg.DROPOUT, params=best_params,
        )
        item_ids = np.arange(1, self.n_items + 1, dtype=np.int32)
        model.precompute_item_embeddings(item_ids, self.genre_table[1:])
        if self.model_output_path:
            model.save(self.model_output_path)
        return model
