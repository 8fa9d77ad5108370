from vae_assoc_tpu.ops.losses import (
    bernoulli_recon,
    gaussian_recon,
    kl_divergence,
    assoc_loss,
)
from vae_assoc_tpu.ops.sampling import reparameterize, sample_eps

__all__ = [
    "bernoulli_recon",
    "gaussian_recon",
    "kl_divergence",
    "assoc_loss",
    "reparameterize",
    "sample_eps",
]
