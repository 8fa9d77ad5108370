"""Latent-space recognition eval (train/eval.py recognition_accuracy):
the paper's second metric — classify characters from latent encodings,
including cross-modal transfer as direct evidence of latent alignment."""

import jax.numpy as jnp
import numpy as np
import pytest

from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.train.eval import _knn_classify, recognition_accuracy


def _clustered(rng, n_per, centers, scale):
    """[K*n_per, d] points around the given class centers + labels."""
    zs, ys = [], []
    for c, ctr in enumerate(centers):
        zs.append(rng.normal(scale=scale, size=(n_per, len(ctr))) + ctr)
        ys.append(np.full(n_per, c))
    return (
        np.concatenate(zs).astype(np.float32),
        np.concatenate(ys).astype(np.int32),
    )


def test_knn_separated_clusters_exact(rng):
    """Well-separated clusters classify perfectly under LOO k-NN."""
    z, y = _clustered(rng, 20, [(0, 0), (30, 0), (0, 30)], scale=0.5)
    pred = _knn_classify(jnp.asarray(z), jnp.asarray(y), jnp.asarray(z),
                         n_classes=3, k=5, mask_diag=True)
    assert float(np.mean(np.asarray(pred) == y)) == 1.0


def test_knn_loo_masking_matters(rng):
    """Without the LOO diagonal mask, k=1 self-matches make same-set
    accuracy a trivial 1.0 even on pure noise; with it, noise stays at
    chance. This is the honesty property the mask exists for."""
    z = rng.normal(size=(300, 8)).astype(np.float32)
    y = rng.integers(0, 10, 300).astype(np.int32)
    unmasked = _knn_classify(jnp.asarray(z), jnp.asarray(y), jnp.asarray(z),
                             n_classes=10, k=1, mask_diag=False)
    masked = _knn_classify(jnp.asarray(z), jnp.asarray(y), jnp.asarray(z),
                           n_classes=10, k=1, mask_diag=True)
    assert float(np.mean(np.asarray(unmasked) == y)) == 1.0
    assert float(np.mean(np.asarray(masked) == y)) < 0.3


def test_knn_vote_tie_breaks_to_smaller_class(rng):
    """2-2 vote ties resolve to the smaller class id (documented
    determinism, not an accident of float ordering)."""
    train = jnp.asarray([[0.0], [1.0], [10.0], [11.0]])
    labels = jnp.asarray([1, 1, 0, 0], jnp.int32)
    pred = _knn_classify(train, labels, jnp.asarray([[5.5]]),
                         n_classes=2, k=4, mask_diag=False)
    assert int(pred[0]) == 0


def test_recognition_accuracy_end_to_end(rng):
    """A briefly-trained joint VAE on the synthetic character set must
    beat 10-class chance on every grid cell, and the cross-modal cells
    must show real transfer (the association term's purpose)."""
    from vae_assoc_tpu.data.pipeline import PairedDataset
    from vae_assoc_tpu.train.loop import train_loop

    ds = PairedDataset.from_synthetic(512, seed=0)
    imgs, trajs = ds.features()
    arch = dict(
        n_input=784, n_z=8, n_hidden_recog_1=64, n_hidden_recog_2=64,
        n_hidden_gener_1=64, n_hidden_gener_2=64,
    )
    arch_t = dict(arch, n_input=200)
    cfg = AssocConfig(
        [
            ModalityConfig("image", arch, recon="bernoulli"),
            ModalityConfig("trajectory", arch_t, recon="gaussian"),
        ],
        assoc_lambda=5.0,
    )
    tc = TrainConfig(batch_size=64, learning_rate=1e-3)
    state, _ = train_loop(cfg, tc, [np.asarray(imgs), np.asarray(trajs)],
                          epochs=6, shuffle=True)
    rec = recognition_accuracy(
        state.params, [imgs, trajs], ds.labels, cfg, k=5
    )
    assert set(rec) == {
        "knn_image", "knn_trajectory",
        "knn_image->trajectory", "knn_trajectory->image",
    }
    for key, v in rec.items():
        assert 0.0 <= v <= 1.0
        assert v > 0.2, f"{key}={v} not above 10-class chance: {rec}"


def test_recognition_accuracy_validates_inputs(rng):
    cfg = AssocConfig(
        [ModalityConfig("image", dict(
            n_input=8, n_z=2, n_hidden_recog_1=4, n_hidden_recog_2=4,
            n_hidden_gener_1=4, n_hidden_gener_2=4))]
    )
    from vae_assoc_tpu.train.step import init_train_state

    state = init_train_state(cfg, TrainConfig(batch_size=4))
    x = rng.normal(size=(1, 8)).astype(np.float32)
    with pytest.raises(ValueError, match=">= 2 samples"):
        recognition_accuracy(state.params, [x], np.asarray([0]), cfg)
    # k larger than n-1 is clamped, not an error; single-modality works.
    x = rng.normal(size=(4, 8)).astype(np.float32)
    out = recognition_accuracy(
        state.params, [x], np.asarray([0, 1, 0, 1]), cfg, k=50
    )
    assert set(out) == {"knn_image"}
