"""Module-level train() helper and the multi-host 2-level mesh hook."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vae_assoc_tpu as vat
from vae_assoc_tpu.configs import AssocConfig, ModalityConfig, TrainConfig
from vae_assoc_tpu.parallel import (
    init_dp_train_state,
    make_dp_train_step,
    make_multihost_mesh,
    shard_batch,
)

TINY = dict(
    n_input=24, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
    n_hidden_gener_1=16, n_hidden_gener_2=16,
)


def test_module_level_train_from_archs(rng):
    data = [
        rng.uniform(0, 1, (128, 24)).astype(np.float32),
        rng.normal(size=(128, 24)).astype(np.float32),
    ]
    seen = []
    model, history = vat.train(
        [TINY, TINY],
        data,
        training_epochs=6,
        display_step=2,
        recon_types=["bernoulli", "gaussian"],
        names=["image", "trajectory"],
        assoc_lambda=0.5,
        batch_size=32,
        on_epoch=lambda e, h: seen.append(e),
    )
    assert history[-1]["total"] < history[0]["total"]
    assert seen == [0, 2, 4]
    # the trained model keeps working through the class API
    z = model.transform([data[0][:4], data[1][:4]])
    assert z[0].shape == (4, 4)


def test_module_level_train_fused_continues_existing_model(rng):
    data = [
        rng.uniform(0, 1, (128, 24)).astype(np.float32),
        rng.normal(size=(128, 24)).astype(np.float32),
    ]
    model = vat.AssocVariationalAutoEncoder(
        [TINY, TINY], recon_types=["bernoulli", "gaussian"], batch_size=32
    )
    step0 = int(model.state.step)
    model, history = vat.train(model, data, training_epochs=4, fused=True)
    assert int(model.state.step) == step0 + 4 * (128 // 32)
    assert history[-1]["total"] < history[0]["total"]


def test_multihost_mesh_shape_and_dp_step(rng):
    mesh = make_multihost_mesh()
    assert mesh.axis_names == ("replica", "data")
    assert mesh.devices.shape == (1, len(jax.devices()))

    cfg = AssocConfig(
        [
            ModalityConfig("image", TINY, recon="bernoulli"),
            ModalityConfig("trajectory", TINY, recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )
    tc = TrainConfig(batch_size=32)
    state = init_dp_train_state(cfg, tc, mesh)
    step = make_dp_train_step(cfg, tc, mesh, batch_axes=("replica", "data"))
    xs = shard_batch(
        mesh,
        [
            rng.uniform(0, 1, (32, 24)).astype(np.float32),
            rng.normal(size=(32, 24)).astype(np.float32),
        ],
        batch_axes=("replica", "data"),
    )
    losses = []
    for _ in range(10):
        state, m = step(state, xs)
        losses.append(float(m["total"]))
    assert losses[-1] < losses[0]
    # 2-level sync keeps params identical everywhere
    w = state.params["modalities"][0]["recog"]["h1"]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
