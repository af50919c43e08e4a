from recommendit_tpu.serving.app import RecommendItApp, create_app, serve  # noqa: F401
from recommendit_tpu.serving.recommender import (  # noqa: F401
    RecommendationPipeline,
    RecommendationResult,
)
