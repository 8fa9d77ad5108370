from vae_assoc_tpu.train.step import TrainState, init_train_state, make_train_step
from vae_assoc_tpu.train.loop import train_loop, train_loop_fused
from vae_assoc_tpu.train.eval import cross_modal_mse, evaluate

__all__ = [
    "TrainState",
    "init_train_state",
    "make_train_step",
    "train_loop",
    "train_loop_fused",
    "cross_modal_mse",
    "evaluate",
]
