from recommendit_tpu.ops.bpr import (  # noqa: F401
    in_batch_bpr_loss,
    in_batch_bpr_loss_xla,
    in_batch_bpr_pallas,
    pairwise_bpr_loss,
)
from recommendit_tpu.ops.topk import (  # noqa: F401
    mips_topk,
    mips_topk_dense,
    mips_topk_numpy,
)
