from .mesh import (
    create_mesh,
    get_default_mesh,
    shard_batch,
    replicate,
    with_sharding,
)
from .halo import halo_exchange, spatial_shard_conv_forward, spatial_shard_net_forward
from .train import make_sharded_train_step, shard_module
from .inference import make_sharded_window_predictor, sharded_sliding_window_inference
from .tp import default_tp_rules, make_tp_train_step, shard_module_tp, tp_spec_for
from .spatial import (
    dp_sp_sharding,
    make_spatial_sharded_forward,
    make_spatial_sharded_train_step,
    shard_bytes_per_device,
)
