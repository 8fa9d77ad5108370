from vae_assoc_tpu.models.networks import (
    init_mlp_vae_params,
    encode_mlp,
    decode_mlp,
)
from vae_assoc_tpu.models.vae import (
    init_vae,
    vae_forward,
    vae_loss,
)
from vae_assoc_tpu.models.assoc import (
    init_assoc,
    assoc_forward,
    assoc_loss_fn,
    cross_generate,
)

__all__ = [
    "init_mlp_vae_params",
    "encode_mlp",
    "decode_mlp",
    "init_vae",
    "vae_forward",
    "vae_loss",
    "init_assoc",
    "assoc_forward",
    "assoc_loss_fn",
    "cross_generate",
]
