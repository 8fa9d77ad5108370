"""Typed configuration for the vae_assoc_tpu framework.

The reference (`navigator8972/vae_assoc`, SURVEY.md §5 "Config / flag system")
configures models through hard-coded *architecture dicts* passed to the VAE
constructors, with keys ``n_input, n_z, n_hidden_recog_1, n_hidden_recog_2,
n_hidden_gener_1, n_hidden_gener_2``. That dict shape is preserved here as the
public knob set; dataclasses wrap it with the training/precision/parallelism
options the TPU rebuild adds.

The five driver-defined build configs (BASELINE.json:7-11) are exposed as
:func:`baseline_config` milestones 1-5.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Iterator, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class FrozenDict(Mapping):
    """Immutable, hashable mapping — lets whole configs be jit-static args
    and lru_cache keys (compiled-program caching across calls)."""

    __slots__ = ("_d", "_h")

    def __init__(self, d: Mapping):
        object.__setattr__(self, "_d", dict(d))
        object.__setattr__(self, "_h", None)

    def __getitem__(self, k):
        return self._d[k]

    def __iter__(self) -> Iterator:
        return iter(self._d)

    def __len__(self) -> int:
        return len(self._d)

    def __hash__(self) -> int:
        if self._h is None:
            object.__setattr__(self, "_h", hash(tuple(sorted(self._d.items()))))
        return self._h

    def __eq__(self, other) -> bool:
        if isinstance(other, (FrozenDict, dict, Mapping)):
            return dict(self._d) == dict(other)
        return NotImplemented

    def __repr__(self) -> str:
        return f"FrozenDict({self._d!r})"

# Architecture-dict keys, mirroring the reference constructor API
# (SURVEY.md §1.1 L2a: `network_architecture` dict). The reference's dicts
# have exactly two hidden layers per net; the rebuild additionally accepts
# deeper stacks via contiguous ``n_hidden_recog_3``, ``n_hidden_gener_3``, …
# keys (the natural extension of the same naming scheme) — see
# :func:`validate_arch`.
ARCH_KEYS = (
    "n_input",
    "n_z",
    "n_hidden_recog_1",
    "n_hidden_recog_2",
    "n_hidden_gener_1",
    "n_hidden_gener_2",
)

_HIDDEN_KEY_RE = re.compile(r"^n_hidden_(recog|gener)_([1-9]\d*)$")


def validate_arch(arch: Mapping[str, int]) -> FrozenDict:
    """Validate an architecture dict; returns an immutable hashable copy.

    Accepts the reference's exact key set plus deeper stacks: any number of
    ``n_hidden_recog_k`` / ``n_hidden_gener_k`` keys as long as each family
    is contiguous from 1 (a dict with ``_1`` and ``_3`` but no ``_2`` is a
    typo, not a 2-layer net — rejected loudly, as are unrecognized keys,
    which earlier versions silently dropped). Recognition and generator
    depths may differ; each needs at least one hidden layer.
    """
    hidden = {"recog": {}, "gener": {}}
    out = {}
    for k in arch:
        if k in ("n_input", "n_z"):
            out[k] = int(arch[k])
            continue
        m = _HIDDEN_KEY_RE.match(k)
        if not m:
            raise ValueError(
                f"unrecognized architecture key {k!r}; expected n_input, "
                "n_z, and contiguous n_hidden_recog_k / n_hidden_gener_k"
            )
        hidden[m.group(1)][int(m.group(2))] = int(arch[k])
    missing = [k for k in ("n_input", "n_z") if k not in out]
    if missing:
        raise ValueError(f"architecture dict missing keys: {missing}")
    for net, layers in hidden.items():
        if not layers:
            raise ValueError(f"architecture dict has no n_hidden_{net}_* keys")
        depth = max(layers)
        want = list(range(1, depth + 1))
        if sorted(layers) != want:
            raise ValueError(
                f"n_hidden_{net}_* keys must be contiguous from 1; got "
                f"layers {sorted(layers)}"
            )
        for k in want:
            out[f"n_hidden_{net}_{k}"] = layers[k]
    for k, v in out.items():
        if v <= 0:
            raise ValueError(f"architecture dim {k}={v} must be positive")
    return FrozenDict(out)


def _hidden_widths(arch: Mapping[str, int], net: str) -> tuple:
    widths = []
    k = 1
    while f"n_hidden_{net}_{k}" in arch:
        widths.append(int(arch[f"n_hidden_{net}_{k}"]))
        k += 1
    return tuple(widths)


def recog_widths(arch: Mapping[str, int]) -> tuple:
    """Hidden-layer widths of the recognition net, in forward order."""
    return _hidden_widths(arch, "recog")


def gener_widths(arch: Mapping[str, int]) -> tuple:
    """Hidden-layer widths of the generator net, in forward order."""
    return _hidden_widths(arch, "gener")


# The reference constructor's `transfer_fct` knob (SURVEY.md §1.1 L2a),
# as names so configs stay hashable/serializable. The fused Pallas MLP
# kernels implement softplus (the reference default); other transfers run
# through the identical-math jnp path.
TRANSFER_FNS = {
    "softplus": jax.nn.softplus,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
}


def _hidden_keys(hidden: int, depth: int) -> dict:
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    out = {}
    for k in range(1, depth + 1):
        out[f"n_hidden_recog_{k}"] = hidden
        out[f"n_hidden_gener_{k}"] = hidden
    return out


def default_image_arch(n_z: int = 20, hidden: int = 500, depth: int = 2) -> dict:
    """28x28 grayscale character image branch (BASELINE.json:7).

    ``depth`` hidden layers per net (2 = the reference architecture)."""
    return dict(n_input=784, n_z=n_z, **_hidden_keys(hidden, depth))


def default_traj_arch(
    n_dims: int = 2,
    n_timesteps: int = 100,
    n_z: int = 20,
    hidden: int = 500,
    depth: int = 2,
) -> dict:
    """Fixed-length flattened pen-stroke trajectory branch (BASELINE.json:8).

    Raw variable-length strokes are resampled to ``n_timesteps`` points and
    flattened (x0, y0, x1, y1, ...) before entering the model.
    ``depth`` hidden layers per net (2 = the reference architecture).
    """
    return dict(
        n_input=n_dims * n_timesteps, n_z=n_z, **_hidden_keys(hidden, depth)
    )


@dataclasses.dataclass(frozen=True)
class ModalityConfig:
    """One modality of the joint model.

    Attributes:
      name: modality identifier (e.g. "image", "trajectory").
      arch: reference-style architecture dict (see :data:`ARCH_KEYS`).
      recon: reconstruction likelihood — "bernoulli" (sigmoid output +
        cross-entropy; images in [0,1]) or "gaussian" (linear output + sum
        of squared error; real-valued trajectory features).
      encoder: "mlp" (reference-parity 2-hidden-layer softplus MLP),
        "conv" (TPU-native conv encoder / transposed-conv decoder image
        branch via XLA convolutions, BASELINE.json:10 config 4; requires
        n_input == 784), or "conv_pallas" (same tower through the Pallas
        im2col conv kernels in kernels/conv.py — parity-tested, but XLA's
        native conv lowering is faster at these small shapes, so "conv"
        is the default fast path).
      n_cond: conditional-VAE one-hot width (Sohn et al. 2015; 0 = the
        unconditional reference model). When > 0 the recognition net sees
        ``concat(x, c)`` and the generator sees ``concat(z, c)`` where c is
        a [B, n_cond] one-hot (or soft) condition vector — label-directed
        generation ("write character 'a'") without an exemplar input.
        MLP towers only: the conditioning is applied at the call boundary
        (inputs pre-concatenated), so the fused Pallas MLP kernels work
        unchanged; the conv towers have no natural concat point and
        reject it.
    """

    name: str
    arch: Mapping[str, int]
    recon: str = "bernoulli"
    encoder: str = "mlp"
    transfer: str = "softplus"
    n_cond: int = 0

    def __post_init__(self):
        object.__setattr__(self, "arch", validate_arch(self.arch))
        if self.recon not in ("bernoulli", "gaussian"):
            raise ValueError(f"unknown recon likelihood: {self.recon!r}")
        if self.encoder not in ("mlp", "conv", "conv_pallas"):
            raise ValueError(f"unknown encoder type: {self.encoder!r}")
        if self.encoder.startswith("conv") and self.arch["n_input"] != 784:
            raise ValueError("conv encoder requires 28x28 (n_input=784) input")
        if self.encoder.startswith("conv") and (
            len(recog_widths(self.arch)) != 2 or len(gener_widths(self.arch)) != 2
        ):
            # The conv tower has a fixed conv1/conv2/dense geometry that
            # reads n_hidden_recog_2 / n_hidden_gener_1 (models/conv.py);
            # deep arch dicts are an MLP-tower feature.
            raise ValueError(
                "conv encoders use the fixed 2-hidden-layer arch-dict shape; "
                "deeper stacks are supported by encoder='mlp' only"
            )
        if self.n_cond < 0:
            raise ValueError(f"n_cond must be >= 0, got {self.n_cond}")
        if self.n_cond > 0 and self.encoder != "mlp":
            raise ValueError(
                "conditioning (n_cond > 0) supports MLP towers only; "
                f"got encoder={self.encoder!r}"
            )
        if self.transfer not in TRANSFER_FNS:
            raise ValueError(
                f"unknown transfer_fct {self.transfer!r}; "
                f"options: {sorted(TRANSFER_FNS)}"
            )


@dataclasses.dataclass(frozen=True)
class AssocConfig:
    """Joint associative model: K modalities + association coupling.

    ``assoc_lambda`` weights the cross-modal latent-association term
    λ·Σ_{i<j} mean_batch ‖z_mean_i − z_mean_j‖² (BASELINE.json:5; SURVEY.md
    §2.1 "Associative joint VAE"). All modalities must share ``n_z``.

    ``assoc_form`` selects the per-pair coupling (ops/losses.ASSOC_FORMS):
    "mean_l2" (default — the reference reconstruction and the parity
    surface), "sample_l2" (L2 on the reparameterized samples; gradients
    reach σ), "sym_kl" (Jeffreys divergence between the Gaussian
    posteriors), or "infonce" (CLIP-style symmetric contrastive loss on
    the normalized latent means, rest-of-batch negatives, temperature
    ``assoc_temp``). SURVEY.md §7 flags the reference's exact form as an
    unverified [R] claim; shipping the candidate readings means a populated
    reference mount is a config flip, not a rebuild.

    ``assoc_negatives`` (infonce only): "local" (default) contrasts each
    shard_map DP shard against its LOCAL batch — the standard
    local-negatives regime, whose effective objective depends on the mesh
    size; "global" all_gathers the normalized latent means over the data
    axis so DP infonce equals single-device infonce per sample
    (docs/PARALLEL.md; wire cost one [B_local, n_z] gather per modality
    per pair).
    """

    modalities: Sequence[ModalityConfig]
    assoc_lambda: float = 1.0
    assoc_form: str = "mean_l2"
    assoc_temp: float = 0.1
    assoc_negatives: str = "local"

    def __post_init__(self):
        object.__setattr__(self, "modalities", tuple(self.modalities))
        from vae_assoc_tpu.ops.losses import ASSOC_FORMS

        if self.assoc_form not in ASSOC_FORMS:
            raise ValueError(
                f"unknown assoc_form {self.assoc_form!r}; one of {ASSOC_FORMS}"
            )
        if self.assoc_temp <= 0:
            raise ValueError(
                f"assoc_temp must be > 0, got {self.assoc_temp}"
            )
        if self.assoc_negatives not in ("local", "global"):
            raise ValueError(
                "assoc_negatives must be 'local' or 'global', got "
                f"{self.assoc_negatives!r}"
            )
        if self.assoc_negatives != "local" and self.assoc_form != "infonce":
            # Only the contrastive form has a negative set; a silent no-op
            # knob on the L2/KL forms would read as if it did something.
            raise ValueError(
                "assoc_negatives='global' only applies to "
                f"assoc_form='infonce' (got {self.assoc_form!r})"
            )
        if len(self.modalities) < 1:
            raise ValueError("need at least one modality")
        if self.assoc_form != "mean_l2" and len(self.modalities) < 2:
            # assoc_loss returns zeros for <2 modalities; a non-default form
            # on a single-modality config is a coupling that never fires.
            raise ValueError(
                f"assoc_form={self.assoc_form!r} needs >= 2 modalities "
                "(the association term couples modality pairs)"
            )
        n_zs = {m.arch["n_z"] for m in self.modalities}
        if len(n_zs) != 1:
            raise ValueError(f"all modalities must share n_z; got {n_zs}")
        names = [m.name for m in self.modalities]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate modality names: {names}")
        n_conds = {m.n_cond for m in self.modalities}
        if len(n_conds) != 1:
            raise ValueError(
                f"all modalities must share n_cond; got {n_conds}"
            )

    @property
    def n_z(self) -> int:
        return self.modalities[0].arch["n_z"]

    @property
    def n_cond(self) -> int:
        """Conditional-VAE one-hot width (0 = unconditional)."""
        return self.modalities[0].n_cond

    def modality_index(self, name_or_idx) -> int:
        if isinstance(name_or_idx, (int, np.integer)):
            name_or_idx = int(name_or_idx)  # np.int64(0) etc. index too
            # Range-check rather than pass through: a negative index would
            # silently select from the end via Python indexing AND mint a
            # fresh jit program per distinct value downstream (modality is
            # a static arg in serving — an unbounded compile set).
            if not 0 <= name_or_idx < len(self.modalities):
                raise KeyError(
                    f"modality index {name_or_idx} out of range "
                    f"[0, {len(self.modalities)})"
                )
            return name_or_idx
        for i, m in enumerate(self.modalities):
            if m.name == name_or_idx:
                return i
        raise KeyError(f"no modality named {name_or_idx!r}")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training/runtime options for the jitted train step.

    Attributes:
      learning_rate / batch_size: mirror the reference constructor kwargs.
      compute_dtype: matmul dtype. fp32 for the CPU-parity config
        (BASELINE.json:7); bf16 (with fp32 params/accum/loss) for the TPU
        data-parallel config (BASELINE.json:11).
      parity_mode: if True, the loss uses the reference's exact formulation
        (eps-clamped log on sigmoid probabilities, fixed sequential-friendly
        reduction order) for fp32 CPU bitwise comparability (BASELINE.json:5).
        If False, the numerically-stable logit-space formulation is used.
      use_pallas: route encoder/decoder/loss through fused Pallas TPU kernels
        where available; falls back to the identical-math jnp path otherwise.
        The string ``"mega"`` selects the per-modality tower megakernels
        (kernels/megakernel.py: encoder+sampler+decoder+loss in one forward
        launch) for the training loss; inference verbs keep the composable
        kernels.
      steps_per_call: number of train steps fused into one device-side
        ``lax.scan`` per host call (amortizes dispatch; SURVEY.md §7
        "Tiny-model TPU efficiency").
      data_axis: mesh axis name for data parallelism.
      seed: RNG seed for init + reparameterization streams.
    """

    learning_rate: float = 1e-3
    batch_size: int = 64
    compute_dtype: Any = jnp.float32
    parity_mode: bool = False
    use_pallas: Any = False  # False | True | "mega"
    steps_per_call: int = 1
    data_axis: str = "data"
    seed: int = 0

    # Adam hyperparameters (TF AdamOptimizer defaults, which the reference
    # uses implicitly: beta1=0.9, beta2=0.999, eps=1e-8).
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8

    # Production training options beyond the reference's fixed-LR Adam
    # (defaults reproduce it exactly — same optimizer state tree, so
    # round-2 checkpoints restore unchanged). All flow through the single
    # optimizer source, `train.step.make_optimizer`, and therefore apply
    # identically under jit / scan / DP / TP / FSDP.
    #   lr_schedule: "constant" | "cosine" (cosine_decay over decay_steps
    #     down to learning_rate * lr_end_factor). Schedules count
    #     OPTIMIZER updates, so with accum_steps > 1 they advance once per
    #     k micro-steps.
    #   warmup_steps: linear 0 -> learning_rate ramp prepended to either
    #     schedule.
    #   grad_clip_norm: clip gradients to this global norm before Adam
    #     (0 = off). The logged grad_norm metric stays the RAW pre-clip
    #     norm — the observability signal clipping exists to monitor.
    #   accum_steps: micro-batches averaged per optimizer update
    #     (optax.MultiSteps); params change only every k-th step.
    #   ema_decay: exponential moving average of the post-update params
    #     (0 = off). Stored as a final optimizer-chain stage whose state is
    #     a params-shaped leaf (zero-init, Adam-style debias on read via
    #     `train.step.ema_params`), so it checkpoints with the opt_state
    #     and re-lays out under every GSPMD/ZeRO layout exactly like the
    #     Adam moments. With accum_steps > 1 the EMA advances once per
    #     optimizer update (boundary), matching the params it averages.
    #   kl_beta / kl_anneal_steps / assoc_warmup_steps: objective
    #     reweighting (β-VAE and warm-up annealing — Higgins et al. 2017,
    #     Bowman et al. 2016). The effective objective is
    #       Σ_k (recon_k + β(u)·kl_k) + s(u)·λ·assoc
    #     with β(u) = kl_beta·min(1, u/kl_anneal_steps) and
    #     s(u) = min(1, u/assoc_warmup_steps) (each ramp identity when its
    #     step count is 0), where u counts OPTIMIZER updates (like the LR
    #     schedules: u = step // accum_steps). Defaults (1.0 / 0 / 0) keep
    #     the static objective byte-identical (the bitwise-parity surface,
    #     docs/PARITY.md). Gradients are exact on every kernel path: the
    #     reweighted total is rebuilt linearly from the logged loss terms
    #     (train.step.apply_objective_weights), the same mechanism the
    #     per-model λ sweep uses. Logged per-term metrics stay UNWEIGHTED;
    #     `total` is the weighted objective actually optimized, and the
    #     effective β/λ-scale are logged as kl_beta_eff / assoc_scale_eff.
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    decay_steps: int = 0
    lr_end_factor: float = 0.0
    grad_clip_norm: float = 0.0
    accum_steps: int = 1
    ema_decay: float = 0.0
    kl_beta: float = 1.0
    kl_anneal_steps: int = 0
    assoc_warmup_steps: int = 0
    #   remat: rematerialize each modality tower's forward in the backward
    #     pass (jax.checkpoint around the per-modality forward) — the
    #     backward recomputes the tower instead of loading saved hidden
    #     activations, trading FLOPs for HBM. Identical math (same
    #     loss/grads, same ε — exact-gradient tested). Honest measured
    #     caveat (docs/PERF.md "Remat"): at depth-8/width-2048/batch-8192
    #     XLA's scheduler hoists the recomputes, so compiled PEAK temp HBM
    #     is unchanged while the step pays the extra forward (1.18×
    #     best-of-3) — check --dry-compile / memory_analysis() for your
    #     shapes before paying the recompute. The megakernel path
    #     ("mega") already rematerializes inside its custom VJP and ignores
    #     this knob; the composable Pallas kernels compose with it (their
    #     in-kernel residuals are recomputed too).
    remat: bool = False


def config_to_dict(cfg: "AssocConfig", tc: "TrainConfig" = None) -> dict:
    """JSON-serializable snapshot of model (+ optional train) config —
    written next to checkpoints so they are self-describing."""
    out = {
        "assoc_lambda": cfg.assoc_lambda,
        "assoc_form": cfg.assoc_form,
        "assoc_temp": cfg.assoc_temp,
        "assoc_negatives": cfg.assoc_negatives,
        "modalities": [
            {
                "name": m.name,
                "arch": dict(m.arch),
                "recon": m.recon,
                "encoder": m.encoder,
                "transfer": m.transfer,
                "n_cond": m.n_cond,
            }
            for m in cfg.modalities
        ],
    }
    if tc is not None:
        d = dataclasses.asdict(tc)
        d["compute_dtype"] = jnp.dtype(tc.compute_dtype).name
        out["train"] = d
    return out


def config_from_dict(d: Mapping) -> tuple:
    """Inverse of :func:`config_to_dict` → (AssocConfig, TrainConfig|None)."""
    cfg = AssocConfig(
        [
            ModalityConfig(
                m["name"], m["arch"], recon=m["recon"],
                encoder=m.get("encoder", "mlp"),
                transfer=m.get("transfer", "softplus"),
                n_cond=m.get("n_cond", 0),
            )
            for m in d["modalities"]
        ],
        assoc_lambda=d["assoc_lambda"],
        # Absent in pre-round-3 snapshots: those models trained with the
        # only form that existed, the default.
        assoc_form=d.get("assoc_form", "mean_l2"),
        assoc_temp=d.get("assoc_temp", 0.1),
        # Absent in pre-round-5 snapshots: local negatives were the only
        # regime that existed.
        assoc_negatives=d.get("assoc_negatives", "local"),
    )
    tc = None
    if "train" in d:
        t = dict(d["train"])
        t["compute_dtype"] = jnp.dtype(t["compute_dtype"])
        tc = TrainConfig(**t)
    return cfg, tc


def load_model_config(path: str):
    """Read a self-describing model directory's ``model_config.json``.

    THE one loader for the save_model layout (api.save_model / the
    driver's --ckpt-dir), shared by `serve.Predictor.load` and the
    `vae-assoc-eval` CLI so the contract cannot drift. Returns
    ``(cfg, tc, raw_dict)`` — raw_dict carries optional extra sections
    (e.g. ``"data"``: the featurization metadata the driver records).
    Raises FileNotFoundError with guidance when the file is absent.
    """
    import json
    import os

    path = os.path.abspath(os.path.expanduser(path))
    cfg_path = os.path.join(path, "model_config.json")
    if not os.path.exists(cfg_path):
        raise FileNotFoundError(
            f"no model_config.json under {path} — write the model with "
            "AssocVariationalAutoEncoder.save_model() or the driver's "
            "--ckpt-dir (both record the self-describing layout)"
        )
    with open(cfg_path) as f:
        raw = json.load(f)
    cfg, tc = config_from_dict(raw)
    return cfg, tc, raw


def baseline_config(milestone: int, **overrides):
    """The five BASELINE.json config milestones (lines 7-11).

    Returns (AssocConfig, TrainConfig). Milestones:
      1: single-modality MLP image VAE, batch 64, fp32 (CPU parity run)
      2: trajectory-only VAE (resampled fixed-length flattened input)
      3: joint associative VAE (image + trajectory, shared latent alignment)
      4: conv encoder / transposed-conv decoder image branch (Pallas conv)
      5: data-parallel joint VAE over an 8-device mesh, bf16 matmuls
    """
    img = ModalityConfig("image", default_image_arch(), recon="bernoulli")
    traj = ModalityConfig("trajectory", default_traj_arch(), recon="gaussian")
    if milestone == 1:
        model = AssocConfig([img], assoc_lambda=0.0)
        train = TrainConfig(batch_size=64, compute_dtype=jnp.float32)
    elif milestone == 2:
        model = AssocConfig([traj], assoc_lambda=0.0)
        train = TrainConfig(batch_size=64)
    elif milestone == 3:
        model = AssocConfig([img, traj], assoc_lambda=1.0)
        train = TrainConfig(batch_size=64)
    elif milestone == 4:
        conv_img = dataclasses.replace(img, encoder="conv")
        model = AssocConfig([conv_img, traj], assoc_lambda=1.0)
        # "mega" = measured-best kernel per modality (round-4 A/B, docs/
        # PERF.md "Conv-tower megakernel"): XLA convs on the image branch
        # (they beat every Pallas conv formulation), the MLP tower
        # megakernel on the trajectory branch. 459.6k vs 454.2k samples/s
        # over use_pallas=True in the same session.
        train = TrainConfig(batch_size=64, use_pallas="mega")
    elif milestone == 5:
        model = AssocConfig([img, traj], assoc_lambda=1.0)
        train = TrainConfig(
            batch_size=1024,  # global batch; 128/chip on an 8-chip mesh
            compute_dtype=jnp.bfloat16,
            use_pallas=True,
            steps_per_call=10,
        )
    else:
        raise ValueError(f"milestone must be 1-5, got {milestone}")
    train = dataclasses.replace(train, **overrides)
    return model, train
