"""vae_assoc_tpu — TPU-native associative multi-modal VAE framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
``navigator8972/vae_assoc`` (Yin et al., "Associate Latent Encodings in
Learning from Demonstrations", AAAI 2017): per-modality VAE encoder/decoder
stacks for character images and pen-stroke trajectories, a reparameterization
sampler, and a joint loss (per-modality reconstruction + KL + cross-modal
latent association), executed as a single jitted train step with a
device-side input pipeline and data-parallel shard_map scaling over a TPU
ICI mesh.

Public API (mirrors the reference's verb set — see SURVEY.md §1.1 L2a/L2b):

- :class:`~vae_assoc_tpu.api.VariationalAutoencoder` — single-modality VAE
  (construct from an architecture dict; ``partial_fit`` / ``transform`` /
  ``generate`` / ``reconstruct``).
- :class:`~vae_assoc_tpu.api.AssocVariationalAutoEncoder` — K-modality joint
  model with the association loss and cross-modal generation
  (image→trajectory and trajectory→image), plus ``save_model`` /
  ``restore_model``.
- :mod:`~vae_assoc_tpu.train` — functional training: ``make_train_step``,
  ``train_loop`` (multi-step ``lax.scan`` on device), data-parallel variants.
- :mod:`~vae_assoc_tpu.data` — UJI Pen Characters v2 parsing, synthetic
  dataset fixtures, and the device-side normalize/resample input pipeline.
"""

from vae_assoc_tpu.version import __version__
from vae_assoc_tpu.configs import (
    ModalityConfig,
    AssocConfig,
    TrainConfig,
    default_image_arch,
    default_traj_arch,
)
from vae_assoc_tpu.api import (
    VariationalAutoencoder,
    AssocVariationalAutoEncoder,
    train,
)

__all__ = [
    "__version__",
    "ModalityConfig",
    "AssocConfig",
    "TrainConfig",
    "default_image_arch",
    "default_traj_arch",
    "VariationalAutoencoder",
    "AssocVariationalAutoEncoder",
    "train",
]
