from vae_assoc_tpu.parallel.mesh import (
    make_mesh,
    make_multihost_mesh,
    batch_spec,
    shard_batch,
    replicate,
    DATA_AXIS,
    MODEL_AXIS,
)
from vae_assoc_tpu.parallel.dp import (
    make_dp_train_step,
    init_dp_train_state,
    dp_train_loop,
)

__all__ = [
    "make_mesh",
    "make_multihost_mesh",
    "batch_spec",
    "shard_batch",
    "replicate",
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_dp_train_step",
    "init_dp_train_state",
    "dp_train_loop",
]
