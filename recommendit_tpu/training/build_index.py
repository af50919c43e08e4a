"""Index building stage: embed the catalog, build + save the MIPS index.

Parity with the reference ``IndexBuilder`` (``src/training/build_index.py``):
loads the trained tower model, embeds the full catalog in batches
(:100-105), sanity-checks norms (:112-116), builds and saves the index
(:128-137). The reference's n_lists auto-reduction (:120-126) has no
equivalent here — the exact scan has no IVF cells.
"""
from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from recommendit_tpu.config import Settings, settings as default_settings
from recommendit_tpu.data.movielens import MovieLensData
from recommendit_tpu.models.retrieval import MIPSIndex
from recommendit_tpu.models.two_tower import TwoTowerModel
from recommendit_tpu.training.train_embeddings import build_genre_table

logger = logging.getLogger(__name__)


class IndexBuilder:
    def __init__(
        self,
        data: MovieLensData,
        cfg: Optional[Settings] = None,
        model_path: Optional[str] = None,
        index_output_path: Optional[str] = None,
    ):
        self.cfg = cfg or default_settings
        self.data = data
        self.model_path = model_path or self.cfg.EMBEDDING_MODEL_PATH
        self.index_output_path = index_output_path or self.cfg.INDEX_PATH

    def build(
        self,
        model: Optional[TwoTowerModel] = None,
        embeddings: Optional[np.ndarray] = None,
        bias: Optional[np.ndarray] = None,
    ) -> MIPSIndex:
        """Build + save the index.

        Either from a :class:`TwoTowerModel` (loaded from ``model_path``
        when not given), or — for >HBM host-table runs where no in-HBM
        model exists — from pre-streamed catalog ``embeddings`` (1-based
        item order, see ``HostTableEmbeddingTrainer.embed_catalog``) and an
        optional raw (n_items,) ``bias`` (pre-temperature-scaling).
        """
        if embeddings is None:
            if model is None:
                model = TwoTowerModel.load(self.model_path)
            n_items = model.n_items
            genre_table = build_genre_table(self.data.movies, n_items)
            item_ids = np.arange(1, n_items + 1, dtype=np.int64)
            embs = model.get_item_embeddings(
                item_ids, genre_table[1:], batch_size=8192
            )
            embed_dim = model.embed_dim
            raw_bias = model.item_bias_np(item_ids)
        else:
            embs = np.asarray(embeddings, np.float32)
            item_ids = np.arange(1, len(embs) + 1, dtype=np.int64)
            embed_dim = embs.shape[1]
            raw_bias = (
                np.asarray(bias, np.float32) if bias is not None
                else np.zeros(len(embs), np.float32)
            )

        norms = np.linalg.norm(embs, axis=1)
        logger.info(
            "Catalog embedded: %d items, norm mean=%.4f min=%.4f max=%.4f",
            len(item_ids), norms.mean(), norms.min(), norms.max(),
        )

        index = MIPSIndex(
            embedding_dim=embed_dim,
            block_size=self.cfg.RETRIEVAL_BLOCK_ITEMS,
            mode=self.cfg.INDEX_MODE,
            dtype=self.cfg.INDEX_DTYPE,
            quant_seed=self.cfg.SEED,
        )
        # learned popularity bias, scaled by the softmax temperature so the
        # MIPS score q·e + T·b is monotone in the training logit cos/T + b
        scaled = self.cfg.SOFTMAX_TEMPERATURE * raw_bias
        if not np.any(scaled):
            scaled = None  # bias-free checkpoint (pairwise/in-batch modes)
        index.build(embs, item_ids, bias=scaled)
        index.save(self.index_output_path)
        return index
