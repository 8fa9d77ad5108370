"""Pallas TPU kernels — fused compute for the hot paths.

Every kernel is a drop-in for a jnp reference implementation and is
parity-tested against it (forward + VJP): tests/test_kernels.py,
test_conv_kernels.py, test_conv_banded.py, test_fused_loss.py.

The conv exports are the BANDED-matmul formulation (kernels/conv_banded) —
the variant `models/vae.py` blesses for ``encoder="conv_pallas"``
(measured ~10x the im2col kernels, docs/PERF.md "Conv kernels"). The
im2col formulation remains importable as ``kernels.conv`` for the
measured-worse baseline it documents.
"""

from vae_assoc_tpu.kernels.mlp import encode_mlp_fused, decode_mlp_fused
from vae_assoc_tpu.kernels.loss import joint_loss_terms_fused
from vae_assoc_tpu.kernels.sampling import reparameterize_fused
from vae_assoc_tpu.kernels.conv_banded import (
    conv3x3_s2,
    convt3x3_s2,
    encode_conv_fused,
    decode_conv_fused,
)

__all__ = [
    "encode_mlp_fused",
    "decode_mlp_fused",
    "joint_loss_terms_fused",
    "reparameterize_fused",
    "conv3x3_s2",
    "convt3x3_s2",
    "encode_conv_fused",
    "decode_conv_fused",
]
