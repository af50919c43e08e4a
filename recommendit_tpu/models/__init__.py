import json
from pathlib import Path

from recommendit_tpu.models.ctr import CTRModel  # noqa: F401
from recommendit_tpu.models.gbdt import HistGBDTRanker  # noqa: F401
from recommendit_tpu.models.ranker import LambdaRankScorer  # noqa: F401
from recommendit_tpu.models.retrieval import MIPSIndex  # noqa: F401
from recommendit_tpu.models.two_tower import (  # noqa: F401
    TwoTowerModel,
    init_params,
    item_tower,
    l2_normalize,
    user_tower,
)


def load_ranker(path: str):
    """Load whichever ranker type was saved at ``path`` (MLP LambdaRank or
    histogram GBDT), dispatching on the meta sidecar."""
    meta_path = Path(str(path) + ".meta.json")
    if not meta_path.exists():
        raise FileNotFoundError(f"Ranker meta not found: {meta_path}")
    meta = json.loads(meta_path.read_text())
    if "n_trees" in meta:
        return HistGBDTRanker.load(path)
    return LambdaRankScorer.load(path)
