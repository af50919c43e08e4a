from recommendit_tpu.models.two_tower import (  # noqa: F401
    TwoTowerModel,
    init_params,
    item_tower,
    l2_normalize,
    user_tower,
)
