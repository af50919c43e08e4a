from recommendit_tpu.training.build_index import IndexBuilder  # noqa: F401
from recommendit_tpu.training.train_ctr import CTRTrainer  # noqa: F401
from recommendit_tpu.training.train_embeddings import EmbeddingTrainer  # noqa: F401
from recommendit_tpu.training.train_ranker import RankerTrainer  # noqa: F401
