from vae_assoc_tpu.train.step import TrainState, init_train_state, make_train_step
from vae_assoc_tpu.train.loop import train_loop, train_loop_fused
from vae_assoc_tpu.train.eval import cross_modal_mse, evaluate
from vae_assoc_tpu.train.sweep import (
    init_sweep_state,
    make_sweep_step,
    select_model,
    sweep_loop,
)

__all__ = [
    "init_sweep_state",
    "make_sweep_step",
    "select_model",
    "sweep_loop",
    "TrainState",
    "init_train_state",
    "make_train_step",
    "train_loop",
    "train_loop_fused",
    "cross_modal_mse",
    "evaluate",
]
