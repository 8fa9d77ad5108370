"""Input-pipeline tests: resampler math vs numpy, rasterizer, UJI parser."""

import os

import jax.numpy as jnp
import numpy as np

from vae_assoc_tpu.data import (
    PairedDataset,
    featurize_pairs,
    generate_raw_strokes,
    parse_uji_text,
)
from vae_assoc_tpu.ops.rasterize import rasterize_trajectories
from vae_assoc_tpu.ops.resample import (
    arc_length_resample,
    normalize_and_flatten,
    unflatten_trajectory,
)


def np_arc_length_resample(pts, t_out):
    """Straightforward numpy reference for the device resampler."""
    seg = np.diff(pts, axis=0)
    seg_len = np.sqrt((seg**2).sum(-1))
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    targets = np.linspace(0, cum[-1], t_out)
    out = np.empty((t_out, pts.shape[1]))
    for i, t in enumerate(targets):
        j = np.clip(np.searchsorted(cum, t, side="right") - 1, 0, len(pts) - 2)
        frac = (t - cum[j]) / max(cum[j + 1] - cum[j], 1e-12)
        out[i] = pts[j] + frac * (pts[j + 1] - pts[j])
    return out


def test_resample_matches_numpy(rng):
    pts = rng.normal(size=(37, 2)).astype(np.float32).cumsum(axis=0)
    padded = np.zeros((64, 2), np.float32)
    padded[:37] = pts
    padded[37:] = pts[-1]
    got = arc_length_resample(jnp.array(padded), jnp.int32(37), 50)
    want = np_arc_length_resample(pts, 50)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_resample_uniform_spacing():
    """On a smooth dense curve (chord≈arc), output gaps are equal."""
    t = np.linspace(0, 2 * np.pi, 1000)
    # Non-uniform input spacing via t²-warp on a circle.
    warp = (t / t[-1]) ** 2 * 2 * np.pi
    pts = np.stack([np.cos(warp), np.sin(warp)], -1).astype(np.float32)
    out = np.asarray(arc_length_resample(jnp.array(pts), jnp.int32(1000), 100))
    gaps = np.sqrt((np.diff(out, axis=0) ** 2).sum(-1))
    assert gaps.std() / gaps.mean() < 0.02


def test_resample_endpoints_preserved(rng):
    pts = rng.normal(size=(30, 2)).astype(np.float32).cumsum(axis=0)
    out = np.asarray(arc_length_resample(jnp.array(pts), jnp.int32(30), 20))
    np.testing.assert_allclose(out[0], pts[0], atol=1e-5)
    np.testing.assert_allclose(out[-1], pts[-1], atol=1e-4)


def test_resample_degenerate_single_point():
    pts = np.full((16, 2), 3.0, np.float32)
    out = np.asarray(arc_length_resample(jnp.array(pts), jnp.int32(1), 10))
    np.testing.assert_allclose(out, 3.0)


def test_normalize_and_flatten_bounds(rng):
    raw = generate_raw_strokes(32, seed=1)
    flat = np.asarray(
        normalize_and_flatten(jnp.array(raw["points"]), jnp.array(raw["lengths"]), 50)
    )
    assert flat.shape == (32, 100)
    assert flat.min() >= -1.0 - 1e-5 and flat.max() <= 1.0 + 1e-5
    # Larger bounding-box side must span the full [-1, 1].
    traj = flat.reshape(32, 50, 2)
    span = traj.max(1) - traj.min(1)
    np.testing.assert_allclose(span.max(-1), 2.0, rtol=1e-3)


def test_unflatten_roundtrip(rng):
    x = rng.normal(size=(4, 60)).astype(np.float32)
    traj = unflatten_trajectory(jnp.array(x))
    assert traj.shape == (4, 30, 2)
    np.testing.assert_array_equal(np.asarray(traj).reshape(4, 60), x)


def test_rasterize_basic(rng):
    raw = generate_raw_strokes(16, seed=2)
    traj = normalize_and_flatten(
        jnp.array(raw["points"]), jnp.array(raw["lengths"]), 128, flatten=False
    )
    imgs = np.asarray(rasterize_trajectories(traj))
    assert imgs.shape == (16, 784)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0 + 1e-6
    np.testing.assert_allclose(imgs.max(axis=1), 1.0, rtol=1e-5)  # per-image peak
    # Ink covers a plausible fraction of the canvas.
    coverage = (imgs > 0.1).mean(axis=1)
    assert (coverage > 0.02).all() and (coverage < 0.6).all()


def test_featurize_pairs_and_dataset():
    ds = PairedDataset.from_synthetic(64, seed=3, n_timesteps=40)
    imgs, trajs = ds.features()
    assert imgs.shape == (64, 784) and trajs.shape == (64, 80)
    assert len(ds) == 64
    t2d = ds.trajectories_2d()
    assert t2d.shape == (64, 40, 2)
    # Same class ⇒ similar images; check determinism of the pipeline.
    imgs2, trajs2 = featurize_pairs(ds._points, ds._lengths, n_timesteps=40)
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs2))


UJI_SAMPLE = """
// UJIpenchars2 sample
WORD a w01
  NUMSTROKES 2
    POINTS 3 # 10 20 11 25 12 30
    POINTS 2 # 14 31 18 33
WORD b w01
  NUMSTROKES 1
    POINTS 4 # 0 0 5 5 10 0 15 5
"""


def test_parse_uji_text():
    samples = parse_uji_text(UJI_SAMPLE)
    assert len(samples) == 2
    char0, strokes0 = samples[0]
    assert char0 == "a" and len(strokes0) == 2
    np.testing.assert_allclose(strokes0[0], [[10, 20], [11, 25], [12, 30]])
    assert samples[1][0] == "b" and samples[1][1][0].shape == (4, 2)


def test_uji_to_dataset(tmp_path):
    p = tmp_path / "uji.txt"
    p.write_text(UJI_SAMPLE)
    ds = PairedDataset.from_uji([str(p)], n_timesteps=20)
    imgs, trajs = ds.features()
    assert imgs.shape == (2, 784) and trajs.shape == (2, 40)


def test_write_uji_text_roundtrip(rng):
    from vae_assoc_tpu.data.uji import write_uji_text

    samples = [
        ("a", [rng.integers(0, 1000, (5, 2)).astype(np.float32),
               rng.integers(0, 1000, (3, 2)).astype(np.float32)]),
        ("7", [(rng.random((4, 2)) * 100).astype(np.float32)]),
    ]
    text = write_uji_text(samples, header="round-trip test")
    parsed = parse_uji_text(text)
    assert [c for c, _ in parsed] == ["a", "7"]
    for (_, want), (_, got) in zip(samples, parsed):
        assert len(want) == len(got)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(w, g)


FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "ujipenchars2_format.txt")


def test_uji_format_fixture_end_to_end():
    """The checked-in UJI-v2-format fixture (240 samples, 6 writer tags,
    multi-stroke characters, integer tablet coords) through parser →
    pipeline features. Content is synthetic (no network egress here —
    scripts/fetch_uji.py documents the real download); the code path is
    the real one."""
    from vae_assoc_tpu.data.uji import load_uji_files

    data = load_uji_files([FIXTURE], native="never")
    assert data["points"].shape[0] == 240
    assert data["label_names"] == [str(d) for d in range(10)]
    ds = PairedDataset.from_uji([FIXTURE], n_timesteps=50)
    imgs, trajs = ds.features()
    assert imgs.shape == (240, 784) and trajs.shape == (240, 100)
    i = np.asarray(imgs)
    assert 0.0 <= i.min() and i.max() <= 1.0 and i.max() > 0.5


def test_uji_fixture_native_python_bit_parity():
    from vae_assoc_tpu import native
    from vae_assoc_tpu.data.uji import load_uji_files

    if not native.available():
        import pytest

        pytest.skip("no g++ toolchain")
    a = load_uji_files([FIXTURE], native="never")
    b = load_uji_files([FIXTURE], native="always")
    np.testing.assert_array_equal(a["points"], b["points"])
    np.testing.assert_array_equal(a["lengths"], b["lengths"])
    np.testing.assert_array_equal(a["labels"], b["labels"])
