"""Cross-modal evaluation: the quality gate of BASELINE.json:2.

The reference's product feature is cross-modal generation (SURVEY.md
§3.3); its quality is measured here as cross-modal reconstruction MSE —
encode modality i, decode modality j, compare against the paired ground
truth x_j — for every ordered modality pair, plus same-modality
reconstruction MSE. One jitted pass per pair.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from vae_assoc_tpu.configs import AssocConfig
from vae_assoc_tpu.models import assoc as assoc_mod


def cross_modal_mse(
    params: dict,
    xs: Sequence[jax.Array],
    cfg: AssocConfig,
    *,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
) -> dict:
    """MSE of every encode(i)→decode(j) path against paired ground truth.

    Returns {"i->j": float-array scalar} for all ordered pairs (i≠j:
    cross-modal; i==j: plain reconstruction). Keys use modality names.
    Conditional models: the condition rides as the trailing xs entry
    (assoc.split_cond) and threads through both nets of every pair.
    """
    results = {}
    xs, cond = assoc_mod.split_cond(xs, cfg)
    k = len(cfg.modalities)
    for i in range(k):
        for j in range(k):
            out = assoc_mod.cross_generate(
                params,
                xs[i],
                cfg,
                src=i,
                dst=j,
                compute_dtype=compute_dtype,
                use_pallas=use_pallas,
                cond=cond,
            )
            d = out.astype(jnp.float32) - xs[j].astype(jnp.float32)
            name = f"{cfg.modalities[i].name}->{cfg.modalities[j].name}"
            results[name] = jnp.mean(d * d)
    return results


import functools


@functools.lru_cache(maxsize=64)
def _eval_fn(cfg: AssocConfig, compute_dtype, use_pallas: bool):
    # Cached per config so periodic evaluation reuses the compiled program.
    return jax.jit(
        lambda p, xs: cross_modal_mse(
            p, xs, cfg, compute_dtype=compute_dtype, use_pallas=use_pallas
        )
    )


def evaluate(params, xs, cfg, *, compute_dtype=jnp.float32, use_pallas=False) -> dict:
    """Host-friendly wrapper: jitted cross-modal MSE dict of floats."""
    fn = _eval_fn(cfg, jnp.dtype(compute_dtype), bool(use_pallas))
    return {k: float(v) for k, v in fn(params, list(xs)).items()}


def _metrics_dict(params, xs, cfg, key, compute_dtype, use_pallas):
    """Loss surface (total + per-term) with deterministic ε, plus the
    cross-modal MSE grid, as one dict of scalars."""
    _, m = assoc_mod.assoc_loss_fn(
        params, xs, cfg, key=key,
        compute_dtype=compute_dtype, use_pallas=use_pallas,
    )
    m = dict(m)
    m.update(
        cross_modal_mse(
            params, xs, cfg, compute_dtype=compute_dtype, use_pallas=use_pallas
        )
    )
    return m


@functools.lru_cache(maxsize=64)
def _chunked_metrics_fn(cfg: AssocConfig, compute_dtype, use_pallas):
    # One compiled program per (config, chunk count, chunk size): a scan
    # over [C, B, D] chunk stacks — periodic validation re-runs it with
    # zero retrace. ε is drawn deterministically per chunk.
    def run(params, stacks, key):
        def body(i, xs_chunk):
            return i + 1, _metrics_dict(
                params, list(xs_chunk), cfg,
                jax.random.fold_in(key, i), compute_dtype, use_pallas,
            )

        _, ms = jax.lax.scan(body, jnp.int32(0), tuple(stacks))
        return jax.tree.map(jnp.mean, ms)

    return jax.jit(run)


_LOG_2PI = 1.8378770664093453  # log(2π)


@functools.lru_cache(maxsize=64)
def _mll_fn(cfg: AssocConfig, k, block, compute_dtype, use_pallas):
    """Jitted IWAE/ELBO estimator: encode ONCE per modality, then scan
    over `k/block` importance-sample blocks (each block decodes
    [block·B, D] in one matmul chain — MXU-sized work, bounded memory:
    only the [k, B] log-weights accumulate across blocks)."""
    from vae_assoc_tpu.configs import TRANSFER_FNS
    from vae_assoc_tpu.models import vae as vae_mod
    from vae_assoc_tpu.ops import losses

    n_blocks = k // block

    def run(params, xs, key, eps_all, cond=None):
        out = {}
        for m_i, mcfg in enumerate(cfg.modalities):
            p_m = params["modalities"][m_i]
            x = xs[m_i].astype(jnp.float32)
            _, encode, decode = vae_mod._net_fns(mcfg, use_pallas)
            transfer = TRANSFER_FNS[mcfg.transfer]
            # Conditional models: the bound estimates log p(x|c) — concat
            # c into the encoder input and every decode block, exactly as
            # in training (models/vae.vae_forward).
            x_enc = x if cond is None else jnp.concatenate([x, cond], axis=1)
            mu, lv = encode(p_m, x_enc, compute_dtype=compute_dtype, transfer=transfer)
            mu, lv = mu.astype(jnp.float32), lv.astype(jnp.float32)
            sigma = jnp.exp(0.5 * lv)
            b, n_z = mu.shape
            d = x.shape[1]
            m_key = jax.random.fold_in(key, m_i)

            def body(i, _, mu=mu, sigma=sigma, lv=lv, x=x, p_m=p_m,
                     decode=decode, transfer=transfer, m_key=m_key,
                     mcfg=mcfg, b=b, n_z=n_z, d=d, m_i=m_i, cond=cond):
                if eps_all is None:
                    eps = jax.random.normal(
                        jax.random.fold_in(m_key, i), (block, b, n_z), jnp.float32
                    )
                else:
                    eps = jax.lax.dynamic_slice_in_dim(
                        eps_all[m_i], i * block, block, axis=0
                    )
                z = mu[None] + sigma[None] * eps  # [block, B, n_z]
                z_dec = z.reshape(block * b, n_z)
                if cond is not None:
                    z_dec = jnp.concatenate(
                        [z_dec, jnp.tile(cond, (block, 1))], axis=1
                    )
                recon = decode(
                    p_m, z_dec,
                    compute_dtype=compute_dtype, transfer=transfer,
                )
                if mcfg.recon == "bernoulli":
                    nll = losses.bernoulli_recon(
                        jnp.broadcast_to(x[None], (block, b, d)).reshape(-1, d),
                        logits=recon,
                    )
                else:
                    # Density convention (documented in
                    # marginal_log_likelihood): N(x̂, σ²=1/2), so the
                    # training SSE term IS −log p up to +(D/2)·log(π).
                    nll = losses.gaussian_recon(
                        jnp.broadcast_to(x[None], (block, b, d)).reshape(-1, d),
                        recon,
                    ) + 0.5 * d * jnp.float32(jnp.log(jnp.pi))
                nll = nll.reshape(block, b)
                # log w = log p(x|z) + log p(z) − log q(z|x); the n_z·log2π
                # halves of p(z) and q cancel.
                log_p_z = -0.5 * (jnp.sum(z * z, axis=-1) + n_z * _LOG_2PI)
                log_q = -0.5 * (
                    jnp.sum(eps * eps, axis=-1)
                    + jnp.sum(lv, axis=-1)[None]
                    + n_z * _LOG_2PI
                )
                return i + 1, -nll + log_p_z - log_q

            _, lw = jax.lax.scan(body, jnp.int32(0), None, length=n_blocks)
            lw = lw.reshape(k, b)  # [n_blocks·block, B]
            name = cfg.modalities[m_i].name
            out[f"elbo_{name}"] = jnp.mean(lw)
            out[f"iwae_{name}"] = jnp.mean(
                jax.scipy.special.logsumexp(lw, axis=0) - jnp.log(jnp.float32(k))
            )
        return out

    return jax.jit(run)


def marginal_log_likelihood(
    params,
    xs,
    cfg,
    *,
    n_importance: int = 64,
    block: int | None = None,
    seed: int = 0,
    compute_dtype=jnp.float32,
    use_pallas=False,
    max_samples: int = 2048,
    eps=None,
) -> dict:
    """Per-modality marginal log-likelihood bounds (nats/sample, HIGHER is
    better): the k-sample IWAE bound (Burda et al. 2016) and the k-draw
    ELBO from the same weights. The reference never estimated log p(x) —
    it printed the training cost — but the bound is the standard way to
    compare VAE fits beyond reconstruction MSE.

    log w = log p(x|z) + log p(z) − log q(z|x) with z = μ + σ·ε. The
    Bernoulli modality's density is exact (logit CE). The Gaussian
    modality's training loss is plain SSE, which corresponds to a
    N(x̂, σ²=1/2) likelihood; the bound adopts that convention (adds the
    (D/2)·log π normalizer), so its absolute value is only comparable
    under the same convention — deltas across checkpoints/models are the
    meaningful quantity. By Jensen, iwae_* ≥ elbo_* holds per draw set
    (asserted in tests), and ε is deterministic in (seed, modality,
    block), so repeated calls reproduce bitwise.

    `eps`: optional list (one [n_importance, B, n_z] array per modality)
    injecting the draws explicitly — the parity-test convention
    (SURVEY.md §7 "RNG semantics").
    """
    import numpy as np

    if n_importance < 1:
        raise ValueError(f"n_importance must be >= 1, got {n_importance}")
    if block is None:
        # Auto: largest divisor of k that is ≤ 8 (8 draws per decode block
        # keeps the [block·B, D] decode matmul MXU-sized without ballooning
        # memory; any divisor is numerically identical).
        block = max(b for b in range(1, min(8, n_importance) + 1)
                    if n_importance % b == 0)
    block = min(block, n_importance)
    if n_importance % block:
        raise ValueError(
            f"block={block} must divide n_importance={n_importance}"
        )
    xs, cond = assoc_mod.split_cond(xs, cfg)
    n = min(int(xs[0].shape[0]), max_samples)
    xs = [jnp.asarray(x[:n]) for x in xs]
    if cond is not None:
        # Normalize here (int labels → one-hot): _mll_fn bypasses
        # vae_forward's prepare_cond for its blockwise decode.
        from vae_assoc_tpu.models.vae import prepare_cond

        cond = prepare_cond(jnp.asarray(cond)[:n], cfg.modalities[0], n)
    if eps is not None:
        eps = [jnp.asarray(e, jnp.float32) for e in eps]
        for e, x, m in zip(eps, xs, cfg.modalities):
            want = (n_importance, n, m.arch["n_z"])
            if e.shape != want:
                raise ValueError(f"eps for {m.name}: {e.shape} != {want}")
    fn = _mll_fn(cfg, n_importance, block, jnp.dtype(compute_dtype),
                 bool(use_pallas))
    out = fn(params, xs, jax.random.key(seed), eps, cond)
    return {key: float(v) for key, v in out.items()}


def label_blind_cond(n: int, n_cond: int):
    """Uniform class-prior condition rows [n, n_cond] — THE label-free
    probe for recognition metrics on conditional models (shared by the
    driver and vae-assoc-eval): encoding with the true one-hot would leak
    the answer into the latent the k-NN then classifies."""
    import numpy as np

    return np.full((n, n_cond), 1.0 / n_cond, np.float32)


def _knn_classify(train_z, train_labels, query_z, n_classes, k, mask_diag):
    """k-NN class prediction on the MXU: one [Q, N] squared-distance matrix
    via ‖a‖² + ‖b‖² − 2a·b (a single matmul), `lax.top_k` neighbors, and a
    one-hot vote count. `mask_diag` excludes query i's own row i of the
    train set (leave-one-out — without it self-matches make every
    same-set accuracy a trivial 1.0; for cross-modal grids it excludes the
    query's own PAIRED sample, which shares its label by construction)."""
    q32 = query_z.astype(jnp.float32)
    t32 = train_z.astype(jnp.float32)
    d2 = (
        jnp.sum(q32 * q32, axis=1, keepdims=True)
        - 2.0 * q32 @ t32.T
        + jnp.sum(t32 * t32, axis=1)[None, :]
    )
    if mask_diag:
        n = t32.shape[0]
        d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    _, idx = jax.lax.top_k(-d2, k)  # [Q, k] nearest
    votes = jax.nn.one_hot(train_labels[idx], n_classes, dtype=jnp.float32)
    # argmax breaks count ties toward the smaller class id — deterministic.
    return jnp.argmax(jnp.sum(votes, axis=1), axis=1)


@functools.lru_cache(maxsize=64)
def _recognition_fn(cfg: AssocConfig, n_classes, k, compute_dtype, use_pallas):
    def run(params, xs, labels):
        zs = assoc_mod.transform(
            params, list(xs), cfg,
            compute_dtype=compute_dtype, use_pallas=use_pallas,
        )
        out = {}
        kk = len(cfg.modalities)
        for i in range(kk):
            for j in range(kk):
                pred = _knn_classify(zs[i], labels, zs[j], n_classes, k, True)
                acc = jnp.mean((pred == labels).astype(jnp.float32))
                ni, nj = cfg.modalities[i].name, cfg.modalities[j].name
                out[f"knn_{ni}" if i == j else f"knn_{ni}->{nj}"] = acc
        return out

    return jax.jit(run)


def recognition_accuracy(
    params,
    xs,
    labels,
    cfg,
    *,
    k: int = 5,
    compute_dtype=jnp.float32,
    use_pallas=False,
    max_samples: int = 4096,
) -> dict:
    """Latent-space recognition: the paper's second metric (SURVEY.md §0 —
    AAAI-17 evaluates character recognition from the latent encodings, not
    just generation quality). Leave-one-out k-NN over the z-means:

    - ``knn_<name>``: classify modality m's latents among themselves — how
      class-structured each latent space is;
    - ``knn_<a>-><b>``: classify modality b's latents using modality a's
      latents as the reference set — nonzero transfer is DIRECT evidence
      the association term aligned the two spaces (with λ=0 the spaces are
      arbitrary rotations of each other and transfer collapses to chance).

    The reference repo itself never implemented this harness (it eyeballed
    plots); rebuilt here because the association loss's entire purpose is
    measured by it. All distance work runs jitted on device (one matmul +
    top_k per grid cell); `max_samples` caps the [N, N] distance matrix
    (4096² fp32 = 64 MB — comfortable; raise it deliberately if needed).
    """
    import numpy as np

    labels = np.asarray(labels)
    n = min(int(labels.shape[0]), int(xs[0].shape[0]), max_samples)
    if n < 2:
        raise ValueError(f"recognition_accuracy needs >= 2 samples, got {n}")
    labels = labels[:n].astype(np.int32)
    n_classes = int(labels.max()) + 1
    k_eff = min(k, n - 1)  # LOO leaves n-1 candidate neighbors
    fn = _recognition_fn(
        cfg, n_classes, k_eff, jnp.dtype(compute_dtype), bool(use_pallas)
    )
    out = fn(params, [jnp.asarray(x[:n]) for x in xs], jnp.asarray(labels))
    return {key: float(v) for key, v in out.items()}


def eval_metrics(
    params,
    xs,
    cfg,
    *,
    batch_size: int = 1024,
    compute_dtype=jnp.float32,
    use_pallas=False,
    seed: int = 0,
) -> dict:
    """Full held-out evaluation: ELBO terms + cross-modal MSE over the
    ENTIRE set, averaged in fixed-shape chunks.

    The reference only ever printed the running training cost; a
    production training loop needs held-out metrics (driver --val-frac).
    Chunking keeps the compile set bounded: whole chunks of `batch_size`
    run under one scanned program, and a ragged tail (if any) adds at most
    one more fixed-shape program. The ε stream is a pure function of
    (seed, chunk index) — repeated evaluation of the same params returns
    identical numbers.
    """
    xs = [jnp.asarray(x) for x in xs]
    n = int(xs[0].shape[0])
    if n == 0:
        raise ValueError("eval_metrics needs at least one sample")
    b = min(batch_size, n)
    ctype = jnp.dtype(compute_dtype)
    key = jax.random.key(seed)
    n_full, rem = divmod(n, b)

    parts = []  # (weight, metrics-dict) pairs
    if n_full:
        stacks = [x[: n_full * b].reshape((n_full, b) + x.shape[1:]) for x in xs]
        fn = _chunked_metrics_fn(cfg, ctype, use_pallas)
        parts.append((n_full * b, fn(params, stacks, key)))
    if rem:
        tail = [x[n_full * b :] for x in xs]
        fn = _chunked_metrics_fn(cfg, ctype, use_pallas)
        parts.append(
            (rem, fn(params, [t[None] for t in tail], jax.random.fold_in(key, n_full)))
        )

    total_w = sum(w for w, _ in parts)
    # ONE batched host transfer for every metric scalar of every part —
    # a per-scalar float() is its own round trip on the high-latency
    # device link (~20 keys × parts, measured hazard in docs/PERF.md).
    metrics_host = jax.device_get([m for _, m in parts])
    out = {}
    for k in metrics_host[0]:
        out[k] = float(
            sum(w * float(m[k]) for (w, _), m in zip(parts, metrics_host))
            / total_w
        )
    return out
