from recommendit_tpu.data.movielens import (  # noqa: F401
    MovieLensData,
    download_movielens,
    load_movielens,
    verify_dataset,
)
from recommendit_tpu.data.ctr import CTRDataset, make_ctr_dataset  # noqa: F401
from recommendit_tpu.data.synthetic import make_synthetic_movielens  # noqa: F401
