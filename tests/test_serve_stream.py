"""Serving predictor (bucketed inference) + streaming prefetch loader."""

import numpy as np
import pytest

import vae_assoc_tpu as vat
from vae_assoc_tpu.configs import TrainConfig
from vae_assoc_tpu.data.stream import prefetch_batches, stream_train
from vae_assoc_tpu.serve import Predictor, _bucket

TINY = dict(
    n_input=24, n_z=4, n_hidden_recog_1=16, n_hidden_recog_2=16,
    n_hidden_gener_1=16, n_hidden_gener_2=16,
)


@pytest.fixture(scope="module")
def model():
    return vat.AssocVariationalAutoEncoder(
        [TINY, TINY], recon_types=["bernoulli", "gaussian"],
        names=["image", "trajectory"],
    )


def test_bucket_rounding():
    assert [_bucket(n) for n in (1, 2, 3, 64, 65, 1000)] == [1, 2, 4, 64, 128, 1024]


def test_predictor_odd_batch_sizes(model, rng):
    pred = Predictor.from_model(model)
    for n in (1, 7, 64, 100):
        x = rng.uniform(0, 1, (n, 24)).astype(np.float32)
        out = pred.cross_generate(x, "image", "trajectory")
        assert out.shape == (n, 24)
        z = pred.transform([x, rng.normal(size=(n, 24)).astype(np.float32)])
        assert z[0].shape == (n, 4)
        r = pred.reconstruct(x, "image")
        assert r.shape == (n, 24) and 0.0 <= r.min() and r.max() <= 1.0


def test_predictor_padding_does_not_change_results(model, rng):
    """Row i of a padded (bucketed) batch == row i of an exact batch."""
    pred = Predictor.from_model(model)
    x = rng.uniform(0, 1, (64, 24)).astype(np.float32)
    full = pred.cross_generate(x, "image", "trajectory")
    part = pred.cross_generate(x[:5], "image", "trajectory")  # pads to 8
    np.testing.assert_allclose(part, full[:5], rtol=1e-6, atol=1e-6)


def test_predictor_from_checkpoint(model, tmp_path, rng):
    model.save_model(str(tmp_path))
    pred = Predictor.from_checkpoint(str(tmp_path), model.config)
    x = rng.uniform(0, 1, (4, 24)).astype(np.float32)
    np.testing.assert_allclose(
        pred.cross_generate(x, 0, 1),
        np.asarray(model.cross_generate(x, 0, 1)),
        rtol=1e-6,
    )


def test_predictor_load_self_describing(model, tmp_path, rng):
    """One-call load: no config object needed (reads model_config.json)."""
    model.save_model(str(tmp_path))
    pred = Predictor.load(str(tmp_path))
    assert [m.name for m in pred.cfg.modalities] == ["image", "trajectory"]
    x = rng.uniform(0, 1, (4, 24)).astype(np.float32)
    np.testing.assert_allclose(
        pred.cross_generate(x, "image", "trajectory"),
        np.asarray(model.cross_generate(x, "image", "trajectory")),
        rtol=1e-6,
    )


def test_predictor_load_missing_config_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="model_config.json"):
        Predictor.load(str(tmp_path))


def test_predictor_warmup_and_oversize_chunking(model, rng, monkeypatch):
    """Batches beyond MAX_BUCKET are split into bucket-size device calls
    and re-concatenated — a front end must absorb oversize requests, not
    raise. Row-for-row equal to the unchunked run."""
    import vae_assoc_tpu.serve as serve_mod

    pred = Predictor.from_model(model)
    pred.warmup(buckets=(4,))
    x = rng.uniform(0, 1, (21, 24)).astype(np.float32)
    want_cross = pred.cross_generate(x, 0, 1)
    want_z = pred.transform([x, x])
    want_gen = pred.generate(np.asarray(want_z[0]), 1)
    # Predictor's chunking reads bucketing.MAX_BUCKET (serve re-exports the
    # name but never reads its own copy) — patch BOTH so the test actually
    # exercises chunked_call, like tests/test_export.py does.
    import vae_assoc_tpu.bucketing as bucketing_mod

    monkeypatch.setattr(bucketing_mod, "MAX_BUCKET", 8)  # 21 rows → 3 chunks
    monkeypatch.setattr(serve_mod, "MAX_BUCKET", 8)
    got_cross = pred.cross_generate(x, 0, 1)
    assert got_cross.shape == (21, 24)
    # Chunked [8,D] buckets vs one [32,D] bucket are different XLA
    # programs; fp32 matmul splits differ at the last-ulp level.
    np.testing.assert_allclose(got_cross, want_cross, rtol=1e-4, atol=1e-6)
    got_z = pred.transform([x, x])
    np.testing.assert_allclose(got_z[0], want_z[0], rtol=1e-4, atol=1e-6)
    got_gen = pred.generate(np.asarray(want_z[0]), 1)
    np.testing.assert_allclose(got_gen, want_gen, rtol=1e-4, atol=1e-6)


def test_prefetch_batches_covers_epoch(rng):
    data = [
        rng.uniform(0, 1, (70, 24)).astype(np.float32),
        rng.normal(size=(70, 24)).astype(np.float32),
    ]
    batches = list(prefetch_batches(data, 16, epochs=2, shuffle=False))
    assert len(batches) == 2 * (70 // 16)
    assert batches[0][0].shape == (16, 24)
    np.testing.assert_allclose(np.asarray(batches[0][0]), data[0][:16])


def test_stream_train_learns(rng):
    from vae_assoc_tpu.configs import AssocConfig, ModalityConfig
    from vae_assoc_tpu.train.step import init_train_state, make_train_step

    cfg = AssocConfig(
        [
            ModalityConfig("image", TINY, recon="bernoulli"),
            ModalityConfig("trajectory", TINY, recon="gaussian"),
        ],
        assoc_lambda=0.5,
    )
    tc = TrainConfig(batch_size=16, learning_rate=3e-3)
    data = [
        rng.uniform(0, 1, (128, 24)).astype(np.float32),
        rng.normal(size=(128, 24)).astype(np.float32),
    ]
    state = init_train_state(cfg, tc)
    step = make_train_step(cfg, tc)
    state, history = stream_train(step, state, data, 16, epochs=8)
    assert float(np.mean([h["total"] for h in history[-4:]])) < float(
        np.mean([h["total"] for h in history[:4]])
    )


def test_microbatcher_matches_direct_and_coalesces(model, rng):
    """Concurrent 1-row requests must coalesce into few device calls and
    return exactly the direct Predictor results, per request, in order."""
    from concurrent.futures import ThreadPoolExecutor

    from vae_assoc_tpu.serve import MicroBatcher

    pred = Predictor.from_model(model)
    n = 48
    xs = [rng.uniform(0, 1, (1, 24)).astype(np.float32) for _ in range(n)]
    direct = [pred.cross_generate(x, "image", "trajectory") for x in xs]

    with MicroBatcher(pred, max_wait_ms=60.0) as mb:
        with ThreadPoolExecutor(max_workers=16) as ex:
            futs = list(ex.map(
                lambda x: mb.submit(x, "image", "trajectory"), xs
            ))
        outs = [f.result(timeout=30) for f in futs]
    # Bucketed [48, D] vs per-request [1, D] runs are different XLA
    # programs; fp32 matmul splits differ at the last-ulp level.
    for got, want in zip(outs, direct):
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    assert mb.dispatches < n, f"no coalescing: {mb.dispatches} calls for {n}"


def test_microbatcher_routes_and_chunking(model, rng):
    """Mixed (src, dst) routes batch separately; oversize loads split; a
    request bigger than max_batch is chunked, not rejected."""
    from vae_assoc_tpu.serve import MicroBatcher

    pred = Predictor.from_model(model)
    with MicroBatcher(pred, max_batch=8, max_wait_ms=40.0) as mb:
        a = rng.uniform(0, 1, (3, 24)).astype(np.float32)
        b = rng.normal(size=(5, 24)).astype(np.float32)
        big = rng.uniform(0, 1, (19, 24)).astype(np.float32)  # 3 chunks
        f1 = mb.submit(a, "image", "trajectory")
        f2 = mb.submit(b, "trajectory", "image")
        f3 = mb.submit(a, 0, 1)  # same route as f1, index spelling
        f_big = mb.submit(big, 0, 1)
        np.testing.assert_allclose(
            f1.result(timeout=30), pred.cross_generate(a, 0, 1),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            f2.result(timeout=30), pred.cross_generate(b, 1, 0),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            f3.result(timeout=30), pred.cross_generate(a, 0, 1),
            rtol=1e-4, atol=1e-6,
        )
        out_big = f_big.result(timeout=30)
        assert out_big.shape == (19, 24)
        np.testing.assert_allclose(
            out_big, pred.cross_generate(big, 0, 1), rtol=1e-4, atol=1e-6,
        )


def test_microbatcher_min_batch_pads_dispatches(model, rng):
    """min_batch pads every dispatch up to the floor, bounding the
    reachable bucket set (serving warms exactly that set at startup);
    results are identical to the unpadded path."""
    from vae_assoc_tpu.serve import MicroBatcher

    pred = Predictor.from_model(model)
    a = rng.uniform(0, 1, (3, 24)).astype(np.float32)
    with MicroBatcher(pred, max_batch=64, min_batch=64,
                      max_wait_ms=10.0) as mb:
        out = mb.cross_generate(a, "image", "trajectory")
    assert out.shape == (3, 24)
    np.testing.assert_allclose(
        out, pred.cross_generate(_pad64(a)[:64], 0, 1)[:3],
        rtol=1e-6, atol=1e-7,
    )


def _pad64(x):
    return np.concatenate([x, np.zeros((64 - x.shape[0],) + x.shape[1:],
                                       x.dtype)], 0)


def test_microbatcher_submit_close_race_never_hangs(model, rng):
    """A submit racing close() must either resolve its future or raise
    'closed' — never orphan a future behind the STOP sentinel (the
    round-2 shutdown race: unsynchronized _closed check vs close())."""
    import threading

    from vae_assoc_tpu.serve import MicroBatcher

    pred = Predictor.from_model(model)
    x = rng.uniform(0, 1, (1, 24)).astype(np.float32)
    pred.cross_generate(x, 0, 1)  # warm the bucket: keep the race window tight
    for _ in range(20):
        mb = MicroBatcher(pred, max_wait_ms=0.5)
        futs, errs = [], []
        barrier = threading.Barrier(3)

        def spam():
            barrier.wait()
            for _ in range(25):
                try:
                    futs.append(mb.submit(x, 0, 1))
                except RuntimeError:
                    errs.append(1)
                    return

        def closer():
            barrier.wait()
            mb.close()

        ts = [threading.Thread(target=spam), threading.Thread(target=spam),
              threading.Thread(target=closer)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
            assert not t.is_alive()
        for f in futs:
            # Every accepted future must resolve (result or exception) —
            # a hang here is the race. close() flushes in-flight work, so
            # results are expected; 'closed' exceptions are acceptable.
            try:
                out = f.result(timeout=10)
                assert out.shape == (1, 24)
            except RuntimeError:
                pass
        mb.close()  # idempotent: second close must not deadlock or re-STOP


def test_microbatcher_cancel_and_close_semantics(model, rng):
    """A cancelled future must not poison its chunk-mates' results, and
    submit() after close() must fail loudly instead of hanging forever."""
    from vae_assoc_tpu.serve import MicroBatcher

    pred = Predictor.from_model(model)
    a = rng.uniform(0, 1, (2, 24)).astype(np.float32)
    with MicroBatcher(pred, max_wait_ms=80.0) as mb:
        f1 = mb.submit(a, 0, 1)
        f_cancel = mb.submit(a, 0, 1)
        assert f_cancel.cancel()
        f2 = mb.submit(a, 0, 1)
        np.testing.assert_allclose(
            f1.result(timeout=30), pred.cross_generate(a, 0, 1),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            f2.result(timeout=30), pred.cross_generate(a, 0, 1),
            rtol=1e-4, atol=1e-6,
        )
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit(a, 0, 1)


def test_microbatcher_dispatches_early_at_full_batch(model, rng):
    """Once pending rows reach max_batch the worker must dispatch without
    waiting out the rest of the collection window."""
    import time as _time

    from vae_assoc_tpu.serve import MicroBatcher

    pred = Predictor.from_model(model)
    x = rng.uniform(0, 1, (4, 24)).astype(np.float32)
    pred.cross_generate(x, 0, 1)  # warm the bucket outside the timed region
    with MicroBatcher(pred, max_batch=4, max_wait_ms=10_000.0) as mb:
        t0 = _time.monotonic()
        out = mb.cross_generate(x, 0, 1)  # fills max_batch by itself
        dt = _time.monotonic() - t0
    assert dt < 5.0, f"waited out the 10 s window: {dt:.1f}s"
    np.testing.assert_allclose(
        out, pred.cross_generate(x, 0, 1), rtol=1e-4, atol=1e-6
    )
