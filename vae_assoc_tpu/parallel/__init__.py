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
from vae_assoc_tpu.parallel.fsdp import (
    fsdp_param_specs,
    shard_fsdp_train_state,
    make_fsdp_train_step,
    init_fsdp_train_state,
    fsdp_train_loop,
)
from vae_assoc_tpu.parallel.tp_fsdp import (
    tp_fsdp_param_specs,
    shard_tp_fsdp_train_state,
    make_tp_fsdp_train_step,
    init_tp_fsdp_train_state,
    tp_fsdp_train_loop,
)
from vae_assoc_tpu.parallel.zero import (
    shard_zero_train_state,
    gather_zero_train_state,
    make_zero_train_step,
    init_zero_train_state,
    zero_train_loop,
)
from vae_assoc_tpu.parallel.pp import (
    STAGE_AXIS,
    make_pp_mesh,
    check_pp,
    shard_pp_batch,
    shard_pp_train_state,
    gather_pp_train_state,
    make_pp_train_step,
    init_pp_train_state,
    pp_train_loop,
)
from vae_assoc_tpu.parallel.tp import (
    tp_param_specs,
    shard_params,
    shard_tp_batch,
    shard_tp_train_state,
    make_tp_train_step,
    init_tp_train_state,
    tp_train_loop,
)

# The shard_map TP layout (kernels kept) deliberately mirrors the GSPMD
# tp.py function names — use it namespaced: `tp_shard.make_tp_train_step`.
from vae_assoc_tpu.parallel import tp_shard

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
    "fsdp_param_specs",
    "shard_fsdp_train_state",
    "make_fsdp_train_step",
    "init_fsdp_train_state",
    "fsdp_train_loop",
    "tp_fsdp_param_specs",
    "shard_tp_fsdp_train_state",
    "make_tp_fsdp_train_step",
    "init_tp_fsdp_train_state",
    "tp_fsdp_train_loop",
    "shard_zero_train_state",
    "gather_zero_train_state",
    "make_zero_train_step",
    "init_zero_train_state",
    "zero_train_loop",
    "STAGE_AXIS",
    "make_pp_mesh",
    "check_pp",
    "shard_pp_batch",
    "shard_pp_train_state",
    "gather_pp_train_state",
    "make_pp_train_step",
    "init_pp_train_state",
    "pp_train_loop",
    "tp_param_specs",
    "shard_params",
    "shard_tp_batch",
    "shard_tp_train_state",
    "make_tp_train_step",
    "init_tp_train_state",
    "tp_train_loop",
    "tp_shard",
]
