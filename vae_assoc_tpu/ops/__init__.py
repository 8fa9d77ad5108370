from vae_assoc_tpu.ops.losses import (
    bernoulli_recon,
    gaussian_recon,
    kl_divergence,
    assoc_loss,
)
from vae_assoc_tpu.ops.sampling import reparameterize, sample_eps
from vae_assoc_tpu.ops.resample import (
    arc_length_resample,
    batch_resample,
    normalize_and_flatten,
    unflatten_trajectory,
    validate_strokes,
)
from vae_assoc_tpu.ops.rasterize import rasterize_trajectories
from vae_assoc_tpu.ops.rbf import fit_rbf, rbf_reconstruct, rbf_basis

__all__ = [
    "bernoulli_recon",
    "gaussian_recon",
    "kl_divergence",
    "assoc_loss",
    "reparameterize",
    "sample_eps",
    "arc_length_resample",
    "batch_resample",
    "normalize_and_flatten",
    "unflatten_trajectory",
    "validate_strokes",
    "rasterize_trajectories",
    "fit_rbf",
    "rbf_reconstruct",
    "rbf_basis",
]
