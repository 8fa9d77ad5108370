"""End-to-end drive of vae_assoc_tpu through its public API on TPU."""
import os
import tempfile

import numpy as np
import jax

print("backend:", jax.default_backend(), jax.devices())
assert jax.default_backend() == "tpu"

import vae_assoc_tpu as vat
from vae_assoc_tpu.data.pipeline import PairedDataset

# Data via the device-side pipeline
ds = PairedDataset.from_synthetic(512, seed=0)
imgs, trajs = ds.features()
imgs, trajs = np.asarray(imgs), np.asarray(trajs)
print("features:", imgs.shape, imgs.min(), imgs.max(), trajs.shape)

# 1-2: joint model + partial_fit
model = vat.AssocVariationalAutoEncoder(
    [vat.default_image_arch(), vat.default_traj_arch()],
    recon_types=["bernoulli", "gaussian"],
    names=["image", "trajectory"],
    assoc_lambda=1.0,
)
costs = []
for i in range(30):
    s = (i * 64) % (512 - 64)
    costs.append(model.partial_fit([imgs[s : s + 64], trajs[s : s + 64]]))
print("cost first/last:", costs[0], costs[-1])
assert costs[-1] < costs[0], "training did not reduce cost"

# 3: transform + cross-modal both directions
z_img, z_traj = model.transform([imgs[:8], trajs[:8]])
assert z_img.shape == (8, 20) and z_traj.shape == (8, 20)
gen_traj = model.cross_generate(imgs[:8], "image", "trajectory")
gen_img = model.cross_generate(trajs[:8], "trajectory", "image")
assert gen_traj.shape == (8, 200) and gen_img.shape == (8, 784)
gi = np.asarray(gen_img)
assert gi.min() >= 0.0 and gi.max() <= 1.0, "traj→img not in [0,1]"
print("cross-modal ok; img range", gi.min(), gi.max())

# 4: save / fit / restore / fit → exact resume
with tempfile.TemporaryDirectory() as td:
    model.save_model(td)
    c1 = model.partial_fit([imgs[:64], trajs[:64]])
    model.restore_model(td)
    c2 = model.partial_fit([imgs[:64], trajs[:64]])
    print("resume costs:", c1, c2)
    assert abs(c1 - c2) < 1e-5 * max(1.0, abs(c1)), "resume not exact"

# 5: single-modality class
v = vat.VariationalAutoencoder(vat.default_image_arch())
c = [v.partial_fit(imgs[:64]) for _ in range(5)]
assert c[-1] < c[0]
r = v.reconstruct(imgs[:4])
assert r.shape == (4, 784)
print("single-modality ok:", c[0], "->", c[-1])

# error paths
try:
    vat.VariationalAutoencoder({"n_input": 10})
    raise SystemExit("FAIL: malformed arch accepted")
except ValueError as e:
    print("malformed arch ok:", e)
try:
    a, b = vat.default_image_arch(), vat.default_traj_arch(n_z=7)
    vat.AssocVariationalAutoEncoder([a, b])
    raise SystemExit("FAIL: mismatched n_z accepted")
except ValueError as e:
    print("mismatched n_z ok:", e)
try:
    model.cross_generate(imgs[:2], "image", "nope")
    raise SystemExit("FAIL: unknown modality accepted")
except KeyError as e:
    print("unknown modality ok:", e)
try:
    model.restore_model("/tmp/definitely-missing-ckpt-xyz")
    raise SystemExit("FAIL: missing ckpt accepted")
except FileNotFoundError as e:
    print("missing ckpt ok:", e)

# functional path: train_loop with steps_per_call>1 on TPU
from vae_assoc_tpu.configs import baseline_config
from vae_assoc_tpu.train import train_loop

cfg, tc = baseline_config(3, batch_size=64, steps_per_call=2)
state, hist = train_loop(cfg, tc, [imgs, trajs], epochs=3)
assert hist[-1]["total"] < hist[0]["total"]
print("train_loop ok:", hist[0]["total"], "->", hist[-1]["total"],
      f"{hist[-1]['samples_per_sec']:.0f} samples/s")
print("ALL CHECKS PASSED")
