from recommendit_tpu.training.build_index import IndexBuilder  # noqa: F401
from recommendit_tpu.training.train_ctr import CTRTrainer  # noqa: F401
from recommendit_tpu.training.train_embeddings import EmbeddingTrainer  # noqa: F401
from recommendit_tpu.training.train_ranker import RankerTrainer  # noqa: F401
from recommendit_tpu.training.host_table import (  # noqa: F401
    HostEmbeddingTable,
    PrefetchIterator,
    make_host_offload_step,
    prefetch_to_device,
)
