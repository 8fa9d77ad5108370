"""Shape-bucketing contract shared by every serving surface.

XLA compiles one program per concrete shape, so serving pads request
batches up to the nearest power-of-two bucket (bounded compile set) and
chunks anything beyond ``MAX_BUCKET`` into multiple device calls. This
lives in its own dependency-free module so AOT-exported artifacts
(:mod:`vae_assoc_tpu.export`) can bucket identically to the live
:class:`vae_assoc_tpu.serve.Predictor` WITHOUT importing model code —
the whole point of a self-contained artifact.
"""

from __future__ import annotations

MAX_BUCKET = 4096


def _bucket(n: int) -> int:
    """Smallest power of two >= n, capped at MAX_BUCKET."""
    b = 1
    while b < n and b < MAX_BUCKET:
        b *= 2
    return b
