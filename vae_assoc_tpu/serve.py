"""Serving: low-latency batched inference with static-shape bucketing.

Production serving on TPU wants every request to hit an already-compiled
program — XLA recompiles on any new shape. The `Predictor` pads incoming
batches up to the nearest power-of-two bucket (one compile per bucket per
endpoint, warmed ahead of time with `warmup()`), runs the jitted
transform / reconstruct / cross-generate endpoints, and slices the
padding off the result. Weights live in HBM once; requests only move
activations.

    pred = Predictor.load(path)                               # self-describing dir
    traj = pred.cross_generate(imgs, "image", "trajectory")   # any batch size
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from vae_assoc_tpu.configs import AssocConfig, TrainConfig
from vae_assoc_tpu.models import assoc as assoc_mod

MAX_BUCKET = 4096


def _bucket(n: int) -> int:
    b = 1
    while b < n and b < MAX_BUCKET:
        b *= 2
    return b


class Predictor:
    """Inference endpoints over frozen params with shape-bucketed batching."""

    def __init__(
        self,
        params: dict,
        cfg: AssocConfig,
        *,
        compute_dtype=jnp.float32,
        use_pallas: bool = False,
    ):
        self.params = params
        self.cfg = cfg
        kw = dict(cfg=cfg, compute_dtype=compute_dtype, use_pallas=use_pallas)
        self._transform = jax.jit(functools.partial(assoc_mod.transform, **kw))
        self._generate = jax.jit(
            functools.partial(assoc_mod.generate, **kw),
            static_argnames=("modality",),
        )
        self._cross = jax.jit(
            functools.partial(assoc_mod.cross_generate, **kw),
            static_argnames=("src", "dst"),
        )

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        cfg: AssocConfig,
        *,
        train_config: Optional[TrainConfig] = None,
        step: Optional[int] = None,
        **kw,
    ) -> "Predictor":
        """Load params from an orbax checkpoint directory."""
        from vae_assoc_tpu.train.step import init_train_state
        from vae_assoc_tpu.utils import checkpoint as ckpt

        tc = train_config or TrainConfig()
        state = ckpt.restore(path, init_train_state(cfg, tc), step=step)
        return cls(state.params, cfg, **kw)

    @classmethod
    def load(cls, path: str, *, step: Optional[int] = None, **kw) -> "Predictor":
        """One-call serving load from a self-describing `save_model` dir.

        Reads `model_config.json` (written by
        `AssocVariationalAutoEncoder.save_model`) so the caller needs no
        config object; compute dtype and kernel choice default to the
        training-time settings (override via **kw).
        """
        import json
        import os

        from vae_assoc_tpu.configs import config_from_dict

        cfg_path = os.path.join(
            os.path.abspath(os.path.expanduser(path)), "model_config.json"
        )
        if not os.path.exists(cfg_path):
            raise FileNotFoundError(
                f"no model_config.json under {path} — save with "
                "AssocVariationalAutoEncoder.save_model(), or use "
                "Predictor.from_checkpoint(path, cfg) for a bare checkpoint"
            )
        with open(cfg_path) as f:
            cfg, tc = config_from_dict(json.load(f))
        kw.setdefault("compute_dtype", tc.compute_dtype)
        kw.setdefault("use_pallas", tc.use_pallas)
        return cls.from_checkpoint(path, cfg, train_config=tc, step=step, **kw)

    @classmethod
    def from_model(cls, model, **kw) -> "Predictor":
        """Snapshot a live `AssocVariationalAutoEncoder`'s current params.

        Params are copied: the model's train step donates its state
        buffers, so aliasing them would leave the Predictor holding
        deleted arrays after the next `partial_fit`.
        """
        params = jax.tree.map(jnp.copy, model.state.params)
        return cls(params, model.config, **kw)

    # -- bucketing -----------------------------------------------------------
    def _pad(self, x: np.ndarray):
        n = x.shape[0]
        if n > MAX_BUCKET:
            raise ValueError(f"batch {n} exceeds MAX_BUCKET={MAX_BUCKET}")
        b = _bucket(n)
        if b == n:
            return jnp.asarray(x), n
        pad = np.zeros((b - n,) + x.shape[1:], x.dtype)
        return jnp.asarray(np.concatenate([np.asarray(x), pad], 0)), n

    # -- endpoints -----------------------------------------------------------
    def transform(self, xs: Sequence[np.ndarray]):
        """Per-modality latent means; accepts any batch size ≤ MAX_BUCKET."""
        padded = [self._pad(np.asarray(x)) for x in xs]
        zs = self._transform(self.params, [p for p, _ in padded])
        return tuple(np.asarray(z)[:n] for z, (_, n) in zip(zs, padded))

    def generate(self, z, modality: Union[int, str]):
        zp, n = self._pad(np.asarray(z))
        # Normalize names → indices BEFORE the jit call: modality is a
        # static arg, so "image" and 0 would otherwise compile (and cache)
        # separately — a warmed-up server would still pay a fresh XLA
        # compile on the first name-addressed request.
        modality = self.cfg.modality_index(modality)
        return np.asarray(self._generate(self.params, zp, modality=modality))[:n]

    def reconstruct(self, x, modality: Union[int, str]):
        i = self.cfg.modality_index(modality)
        return self.cross_generate(x, i, i)

    def cross_generate(self, x, src: Union[int, str], dst: Union[int, str]):
        xp, n = self._pad(np.asarray(x))
        src = self.cfg.modality_index(src)  # see generate(): names → indices
        dst = self.cfg.modality_index(dst)
        return np.asarray(self._cross(self.params, xp, src=src, dst=dst))[:n]

    def warmup(self, buckets: Sequence[int] = (64, 256, 1024)) -> None:
        """Pre-compile the cross-modal endpoints for the given buckets."""
        k = len(self.cfg.modalities)
        for b in buckets:
            for i in range(k):
                x = np.zeros((b, self.cfg.modalities[i].arch["n_input"]), np.float32)
                for j in range(k):
                    self.cross_generate(x, i, j)
