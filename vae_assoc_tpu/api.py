"""Public API mirroring the reference's class surface.

The reference exposes `VariationalAutoencoder` (per-modality) and
`AssocVariationalAutoEncoder` (joint) classes with the verb set
`partial_fit / transform / generate / reconstruct` plus
`save_model / restore_model` (SURVEY.md §1.1 L2a-L2b). These wrappers keep
that surface — same constructor knobs: architecture dict(s),
`transfer_fct`-equivalent, `learning_rate`, `batch_size`, `assoc_lambda` —
while the implementation is the functional TPU core: state is an explicit
pytree, every verb is a cached jitted function, and nothing resembles a
TF session.

Users wanting maximum control (shard_map, custom loops, multi-step scan)
should use :mod:`vae_assoc_tpu.train` and :mod:`vae_assoc_tpu.models`
directly; these classes are the drop-in-familiar entry point.
"""

from __future__ import annotations

import functools
from typing import Mapping, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.models import assoc as assoc_mod
from vae_assoc_tpu.train.step import TrainState, init_train_state, make_train_step


class AssocVariationalAutoEncoder:
    """K-modality associative VAE with the reference's verb set.

    Construct with a list of architecture dicts (one per modality), as the
    reference does: ``AssocVariationalAutoEncoder([arch_img, arch_traj],
    assoc_lambda=..., learning_rate=..., batch_size=...)``.
    """

    def __init__(
        self,
        network_architectures: Sequence[Mapping[str, int]],
        *,
        recon_types: Optional[Sequence[str]] = None,
        names: Optional[Sequence[str]] = None,
        transfer_fct: str = "softplus",
        assoc_lambda: float = 1.0,
        assoc_form: str = "mean_l2",
        assoc_temp: float = 0.1,
        learning_rate: float = 1e-3,
        batch_size: int = 64,
        seed: int = 0,
        n_cond: int = 0,
        train_config: Optional[TrainConfig] = None,
        model_config: Optional[AssocConfig] = None,
    ):
        if model_config is not None:
            self.config = model_config
        else:
            k = len(network_architectures)
            if recon_types is None:
                recon_types = ["bernoulli"] * k
            if names is None:
                names = [f"modality_{i}" for i in range(k)]
            self.config = AssocConfig(
                [
                    ModalityConfig(
                        nm, arch, recon=rt, transfer=transfer_fct, n_cond=n_cond
                    )
                    for nm, arch, rt in zip(names, network_architectures, recon_types)
                ],
                assoc_lambda=assoc_lambda,
                assoc_form=assoc_form,
                assoc_temp=assoc_temp,
            )
        self.train_config = train_config or TrainConfig(
            learning_rate=learning_rate, batch_size=batch_size, seed=seed
        )
        self.state: TrainState = init_train_state(self.config, self.train_config)
        # partial_fit is a one-minibatch verb; a steps_per_call>1 config
        # (e.g. milestone 5's fused-scan TrainConfig) would make the cached
        # step expect [N,B,D] stacks — always build the single-step variant
        # here. `train(...)`/train_loop still honor steps_per_call.
        import dataclasses as _dc

        self._step_fn = make_train_step(
            self.config, _dc.replace(self.train_config, steps_per_call=1)
        )
        self._gen_key = jax.random.key(self.train_config.seed + 1)
        cd = self.train_config.compute_dtype
        up = self.train_config.use_pallas
        self._transform = jax.jit(
            functools.partial(
                assoc_mod.transform, cfg=self.config, compute_dtype=cd, use_pallas=up
            )
        )
        self._generate = jax.jit(
            functools.partial(
                assoc_mod.generate, cfg=self.config, compute_dtype=cd, use_pallas=up
            ),
            static_argnames=("modality",),
        )
        self._cross = jax.jit(
            functools.partial(
                assoc_mod.cross_generate,
                cfg=self.config,
                compute_dtype=cd,
                use_pallas=up,
            ),
            static_argnames=("src", "dst"),
        )

    def _host_cond(self, cond, batch: int):
        """Host-boundary condition validation (conditional models): range-
        check integer labels and one-hot them in numpy BEFORE the jit call.
        Inside a traced program `jax.nn.one_hot` silently zero-encodes an
        out-of-range label — a class-9 request against n_cond=9 would train
        or decode with a BLANK condition. bucketing.check_cond is the same
        gate the serving surfaces use (incl. the clean unconditional-model
        rejection)."""
        from vae_assoc_tpu import bucketing

        c = bucketing.check_cond(
            None if cond is None else np.asarray(cond),
            self.config.n_cond, batch,
        )
        return None if c is None else jnp.asarray(c)

    def _host_xs(self, xs: Sequence) -> list:
        """asarray a batch list, validating a trailing cond entry host-side."""
        xs = [jnp.asarray(x) for x in xs]
        k = len(self.config.modalities)
        for i, x in enumerate(xs[:k]):
            # An empty slice (e.g. an off-the-end numpy window) would train
            # on mean-of-nothing NaNs and silently poison the params.
            if x.ndim < 1 or x.shape[0] == 0:
                raise ValueError(
                    f"batch for modality {i} ({self.config.modalities[i].name})"
                    f" is empty: shape {tuple(x.shape)}"
                )
        if self.config.n_cond and len(xs) == k + 1:
            xs[k] = self._host_cond(xs[k], int(xs[0].shape[0]))
        return xs

    # -- training ----------------------------------------------------------
    def partial_fit(self, xs: Sequence[np.ndarray]) -> float:
        """One optimizer step on a list of per-modality minibatches.

        Conditional models (``n_cond > 0``): append the condition as one
        extra trailing entry — ``[X_0, ..., X_{K-1}, cond]`` where cond is
        int labels [B] or one-hot [B, n_cond].

        Returns the joint cost (the reference returns `cost` from
        `sess.run`). NOTE: this per-call host sync exists for API parity;
        throughput-critical code should use `train_loop`/`make_train_step`.
        """
        xs = self._host_xs(xs)
        self.state, metrics = self._step_fn(self.state, xs)
        return float(metrics["total"])

    # -- inference ---------------------------------------------------------
    def transform(self, xs: Sequence[np.ndarray]):
        """Per-modality latent means [μ_0..μ_{K-1}]. Conditional models:
        append the condition as the trailing entry."""
        return self._transform(self.state.params, self._host_xs(xs))

    def generate(self, z=None, modality: Union[int, str] = 0, *, cond=None):
        """Decode z (or a FRESH standard-normal draw) with one modality's
        decoder — the prior-sample key advances per call, as the reference's
        stateful `random_normal` did. Conditional models REQUIRE `cond`
        (labels [B] or one-hot [B, n_cond]) — that is the point: sample
        p(x|c) for a chosen class with no exemplar input."""
        if z is None:
            self._gen_key, sub = jax.random.split(self._gen_key)
            b = 1 if cond is None else np.asarray(cond).shape[0]
            z = jax.random.normal(sub, (b, self.config.n_z), jnp.float32)
        if cond is None:
            return self._generate(self.state.params, jnp.asarray(z), modality=modality)
        return self._generate(
            self.state.params, jnp.asarray(z), modality=modality,
            cond=self._host_cond(cond, int(np.asarray(z).shape[0])),
        )

    def reconstruct(self, xs: Sequence[np.ndarray], *, sample: bool = False):
        """Per-modality reconstructions.

        sample=False (default): deterministic mean path (encode → μ →
        decode). sample=True: through a reparameterized draw z = μ + σ·ε
        with a fresh key — the reference's `reconstruct` semantics (its
        graph always sampled). Conditional models: trailing cond entry.
        """
        from vae_assoc_tpu.models import assoc as _assoc

        xs_norm = self._host_xs(xs)
        xs_split, cond = _assoc.split_cond(xs_norm, self.config)
        if not sample:
            # The private jitted transform with the already-normalized
            # list (NOT self.transform: the single-modality subclass
            # overrides it with an unpacked (X, cond) signature, and
            # re-entering the public verb would re-normalize).
            zs = self._transform(self.state.params, xs_norm)
            return tuple(
                self._generate(self.state.params, z, modality=i)
                if cond is None
                else self._generate(
                    self.state.params, z, modality=i, cond=jnp.asarray(cond)
                )
                for i, z in enumerate(zs)
            )
        from vae_assoc_tpu.models import vae as vae_mod

        self._gen_key, *keys = jax.random.split(
            self._gen_key, len(self.config.modalities) + 1
        )
        return tuple(
            vae_mod.reconstruct(
                p, jnp.asarray(x), m, key=k,
                compute_dtype=self.train_config.compute_dtype,
                cond=cond,
            )
            for p, x, m, k in zip(
                self.state.params["modalities"], xs_split,
                self.config.modalities, keys,
            )
        )

    def cross_generate(self, x, src: Union[int, str], dst: Union[int, str], *, cond=None):
        """Encode with modality `src`, decode with modality `dst`.
        Conditional models: pass `cond` (labels [B] or one-hot)."""
        if cond is None:
            return self._cross(self.state.params, jnp.asarray(x), src=src, dst=dst)
        return self._cross(
            self.state.params, jnp.asarray(x), src=src, dst=dst,
            cond=self._host_cond(cond, int(np.asarray(x).shape[0])),
        )

    # -- persistence (reference: tf.train.Saver) ----------------------------
    def save_model(self, path: str, step: Optional[int] = None) -> str:
        """Checkpoint state AND config — the directory is self-describing
        (reload with :meth:`load` without knowing the constructor args)."""
        import json
        import os

        from vae_assoc_tpu.configs import config_to_dict
        from vae_assoc_tpu.utils import checkpoint as ckpt

        out = ckpt.save(path, self.state, step=step)
        cfg_path = os.path.join(os.path.abspath(os.path.expanduser(path)),
                                "model_config.json")
        with open(cfg_path, "w") as f:
            json.dump(config_to_dict(self.config, self.train_config), f, indent=1)
        return out

    def restore_model(self, path: str, step: Optional[int] = None) -> None:
        from vae_assoc_tpu.utils import checkpoint as ckpt

        self.state = ckpt.restore(path, self.state, step=step)

    @classmethod
    def load(cls, path: str, step: Optional[int] = None) -> "AssocVariationalAutoEncoder":
        """Reconstruct a model purely from a `save_model` directory."""
        import json
        import os

        from vae_assoc_tpu.configs import config_from_dict

        cfg_path = os.path.join(os.path.abspath(os.path.expanduser(path)),
                                "model_config.json")
        if not os.path.exists(cfg_path):
            raise FileNotFoundError(
                f"no model_config.json under {path} — was this saved with "
                "save_model()?"
            )
        with open(cfg_path) as f:
            cfg, tc = config_from_dict(json.load(f))
        model = cls([], model_config=cfg, train_config=tc)
        model.restore_model(path, step=step)
        return model


def train(
    model_or_archs,
    data: Sequence[np.ndarray],
    *,
    training_epochs: int = 10,
    display_step: int = 5,
    fused: bool = False,
    on_epoch=None,
    **model_kwargs,
):
    """Module-level training helper mirroring the reference's `train(...)`
    (SURVEY.md §2.1 "Associative joint VAE": module-level train helper).

    Args:
      model_or_archs: an existing `AssocVariationalAutoEncoder`, or a list
        of architecture dicts to construct one (``**model_kwargs`` forwarded
        to the constructor: recon_types, names, assoc_lambda, ...).
      data: list of K paired host arrays [N, n_input_k].
      fused: run all epochs as one device program (`train_loop_fused`).
      on_epoch: callback(epoch, metrics) every `display_step` epochs.
        **With ``fused=True`` the callbacks fire only after the whole run
        completes** — the entire training loop is a single XLA program that
        cannot call back into Python mid-flight; the history is replayed to
        `on_epoch` at the end. For live progress on long runs, either use
        ``fused=False`` (one device program per epoch) or chunk the run
        into several shorter `train(..., fused=True)` calls the way
        `train.driver` does.

    Returns (model, history).
    """
    from vae_assoc_tpu.train.loop import train_loop, train_loop_fused

    if isinstance(model_or_archs, AssocVariationalAutoEncoder):
        model = model_or_archs
    else:
        model = AssocVariationalAutoEncoder(model_or_archs, **model_kwargs)
    if fused:
        state, history = train_loop_fused(
            model.config, model.train_config, data,
            epochs=training_epochs, state=model.state,
        )
        if on_epoch is not None:
            for e, h in enumerate(history):
                if e % display_step == 0:
                    on_epoch(e, h)
    else:
        state, history = train_loop(
            model.config, model.train_config, data,
            epochs=training_epochs, state=model.state,
            display_step=display_step, on_metrics=on_epoch,
        )
    model.state = state
    return model, history


class VariationalAutoencoder(AssocVariationalAutoEncoder):
    """Single-modality VAE — the reference's `vae.py` class surface.

    ``VariationalAutoencoder(network_architecture, learning_rate=...,
    batch_size=...)`` with `partial_fit(X)` / `transform(X)` / `generate(z)`
    / `reconstruct(X)` taking single arrays instead of per-modality lists.
    """

    def __init__(
        self,
        network_architecture: Optional[Mapping[str, int]] = None,
        *,
        recon_type: str = "bernoulli",
        transfer_fct: str = "softplus",
        learning_rate: float = 1e-3,
        batch_size: int = 64,
        seed: int = 0,
        n_cond: int = 0,
        train_config: Optional[TrainConfig] = None,
        model_config: Optional[AssocConfig] = None,
    ):
        if model_config is not None:
            # The inherited classmethod `load()` reconstructs via
            # cls([], model_config=..., train_config=...) — accept that
            # spelling here too so the save_model/load round-trip works for
            # the single-modality subclass.
            if len(model_config.modalities) != 1:
                raise ValueError(
                    "VariationalAutoencoder is single-modality; the saved "
                    f"config has {len(model_config.modalities)} modalities "
                    "— use AssocVariationalAutoEncoder.load()"
                )
            super().__init__(
                [], model_config=model_config, train_config=train_config
            )
            return
        if network_architecture is None:
            raise ValueError("network_architecture is required")
        super().__init__(
            [network_architecture],
            recon_types=[recon_type],
            names=["x"],
            transfer_fct=transfer_fct,
            assoc_lambda=0.0,
            learning_rate=learning_rate,
            batch_size=batch_size,
            seed=seed,
            n_cond=n_cond,
            train_config=train_config,
        )

    def partial_fit(self, X, cond=None) -> float:
        xs = [X] if cond is None else [X, cond]
        return super().partial_fit(xs)

    def transform(self, X, cond=None):
        xs = [X] if cond is None else [X, cond]
        return super().transform(xs)[0]

    def reconstruct(self, X, *, sample: bool = False, cond=None):
        xs = [X] if cond is None else [X, cond]
        return super().reconstruct(xs, sample=sample)[0]
