from recommendit_tpu.features.engineering import FeatureEngineer  # noqa: F401
from recommendit_tpu.features.schema import (  # noqa: F401
    FEATURE_COLUMNS,
    GENRES,
    GENRE_TO_IDX,
    N_FEATURES,
    N_GENRES,
    feature_columns,
)
from recommendit_tpu.features.store import FeatureStore, RedisFeatureStore  # noqa: F401
