from recommendit_tpu.parallel.embedding import (  # noqa: F401
    bucketed_embedding_lookup,
    sharded_dual_lookup,
    sharded_embedding_lookup,
)
from recommendit_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharded,
    create_mesh,
    distributed_init,
    pad_to_multiple,
    params_shardings,
    replicated,
    row_sharded,
)
from recommendit_tpu.parallel.retrieval import (  # noqa: F401
    sharded_mips_topk,
    sharded_mips_topk_ring,
)
from recommendit_tpu.parallel.train import (  # noqa: F401
    init_sharded_state,
    make_sharded_train_step,
    shard_params,
)
from recommendit_tpu.parallel.serve import make_sharded_serve_fn  # noqa: F401,E402
from recommendit_tpu.parallel.ctr import (  # noqa: F401
    init_ctr_sharded_state,
    make_ctr_sharded_train_step,
    shard_ctr_params,
)
