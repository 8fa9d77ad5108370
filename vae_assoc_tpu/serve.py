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

from vae_assoc_tpu import bucketing
from vae_assoc_tpu.bucketing import MAX_BUCKET, _bucket  # noqa: F401
from vae_assoc_tpu.configs import AssocConfig, TrainConfig
from vae_assoc_tpu.models import assoc as assoc_mod


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
        self.compute_dtype = compute_dtype  # introspection (export.py)
        self.use_pallas = use_pallas
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
        from vae_assoc_tpu.configs import TrainConfig, load_model_config

        # load_model_config: THE one loader for the save_model layout
        # (shared with vae-assoc-eval so the contract cannot drift).
        cfg, tc, _ = load_model_config(path)
        tc = tc or TrainConfig()
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

    # -- endpoints -----------------------------------------------------------
    # Pad/chunk bucketing lives ONCE in bucketing.py (shared verbatim with
    # export.ExportedPredictor so the two surfaces cannot drift): batches
    # larger than MAX_BUCKET split into MAX_BUCKET-row device calls,
    # smaller ones pad up to a power-of-two bucket.
    def _cond(self, cond, batch):
        """Normalize the request condition (bucketing.check_cond — the ONE
        serving-side gate, shared with export/serve_http)."""
        return bucketing.check_cond(cond, self.cfg.n_cond, batch)

    def transform(self, xs: Sequence[np.ndarray]):
        """Per-modality latent means; accepts any batch size. Conditional
        models: pass the condition as the trailing xs entry (labels or
        one-hot — normalized here so bucketing pads a float array)."""
        xs = list(xs)
        k = len(self.cfg.modalities)
        if self.cfg.n_cond and len(xs) == k + 1:
            xs[k] = self._cond(xs[k], np.asarray(xs[0]).shape[0])
        return bucketing.chunked_multi_call(
            lambda ps: self._transform(self.params, ps), xs
        )

    def generate(self, z, modality: Union[int, str], *, cond=None):
        # Normalize names → indices BEFORE the jit call: modality is a
        # static arg, so "image" and 0 would otherwise compile (and cache)
        # separately — a warmed-up server would still pay a fresh XLA
        # compile on the first name-addressed request.
        modality = self.cfg.modality_index(modality)
        cond = self._cond(cond, np.asarray(z).shape[0])
        # The two spellings below stay distinct on purpose: the warmed
        # unconditional programs were traced WITHOUT the cond kwarg.
        return bucketing.chunked_cond_call(
            lambda zp, cp: (
                self._generate(self.params, zp, modality=modality)
                if cp is None
                else self._generate(self.params, zp, modality=modality, cond=cp)
            ),
            z, cond,
        )

    def reconstruct(self, x, modality: Union[int, str], *, cond=None):
        i = self.cfg.modality_index(modality)
        return self.cross_generate(x, i, i, cond=cond)

    def cross_generate(self, x, src: Union[int, str], dst: Union[int, str],
                       *, cond=None):
        src = self.cfg.modality_index(src)  # see generate(): names → indices
        dst = self.cfg.modality_index(dst)
        cond = self._cond(cond, np.asarray(x).shape[0])
        return bucketing.chunked_cond_call(
            lambda xp, cp: (
                self._cross(self.params, xp, src=src, dst=dst)
                if cp is None
                else self._cross(self.params, xp, src=src, dst=dst, cond=cp)
            ),
            x, cond,
        )

    def warmup(self, buckets: Sequence[int] = (64, 256, 1024), *,
               all_endpoints: bool = False) -> None:
        """Pre-compile the cross-modal endpoints for the given buckets.

        all_endpoints=True also compiles transform and generate (separate
        jitted programs) — a server that warms ALL reachable programs at
        startup never compiles on a request thread (`MicroBatcher`'s
        `min_batch` bounds the reachable bucket set; request-thread
        compiles measured pathologically slow on tunnel TPU backends).
        """
        bucketing.warmup_endpoints(
            self, self.cfg, buckets, all_endpoints=all_endpoints
        )


def _join_futures(futs):
    """Future resolving to the row-concatenation of `futs` results.

    First chunk exception wins; chunk order is preserved regardless of
    completion order.
    """
    import threading
    from concurrent.futures import Future

    agg: Future = Future()
    results = [None] * len(futs)
    state = {"pending": len(futs)}
    lock = threading.Lock()

    def _cb(i, f):
        exc = f.exception()
        with lock:
            if agg.done():
                return
            if exc is not None:
                agg.set_exception(exc)
                return
            results[i] = f.result()
            state["pending"] -= 1
            if state["pending"] == 0:
                agg.set_result(np.concatenate(results, axis=0))

    for i, f in enumerate(futs):
        f.add_done_callback(functools.partial(_cb, i))
    return agg


class MicroBatcher:
    """Coalesce concurrent cross_generate requests into batched device calls.

    Production serving pattern: many small concurrent requests each paying
    a full device round-trip waste both link RTT and MXU occupancy (a
    1-row call costs nearly the same wall-clock as a 256-row call — see
    the latency table in BASELINE.md). The batcher gives each endpoint a
    collection window: a background thread drains the request queue,
    groups requests by (src, dst) route, concatenates their rows, runs ONE
    bucketed `Predictor.cross_generate` per route, and scatters the result
    slices back to per-request futures.

        with MicroBatcher(pred, max_wait_ms=2.0) as mb:
            fut = mb.submit(x, "image", "trajectory")   # non-blocking
            y = mb.cross_generate(x2, 0, 1)             # blocking sugar
            traj = fut.result()

    Semantics: results are identical to direct Predictor calls (asserted
    in tests/test_serve_stream.py); ordering within a batch is preserved
    per request. Latency: a request waits at most ~max_wait_ms for
    co-travelers before dispatch; max_batch bounds the concatenated rows
    per device call (larger loads split across calls).
    """

    _STOP = object()

    def __init__(self, predictor: Predictor, *, max_batch: int = 1024,
                 max_wait_ms: float = 2.0, min_batch: int = 0):
        import queue
        import threading

        self.predictor = predictor
        self.max_batch = int(max_batch)
        # Pad every dispatch up to min_batch rows: with min_batch a power
        # of two, the reachable bucket set becomes the FINITE
        # {min_batch, 2·min_batch, …, max_batch}, so a server can warm
        # every program it will ever run at startup and no request thread
        # ever triggers an XLA compile (see serve_http.ModelServer —
        # request-thread compiles are also pathologically slow on
        # high-latency tunnel backends).
        self.min_batch = int(min_batch)
        if self.min_batch > self.max_batch:
            raise ValueError(
                f"min_batch {self.min_batch} > max_batch {self.max_batch}: "
                "dispatch padding would exceed the per-call row cap"
            )
        self.max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self.dispatches = 0  # device calls made (observability + tests)
        self._closed = False
        # Serializes the closed-check+enqueue against close(): without it a
        # submit() that passes the _closed check concurrently with close()
        # can land its request BEHIND the STOP sentinel — the worker has
        # already returned and that future would never resolve.
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _enqueue(self, route, chunks):
        """Atomically (w.r.t. close) enqueue one future per chunk."""
        from concurrent.futures import Future

        futs = [Future() for _ in chunks]
        with self._lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            for x, fut in zip(chunks, futs):
                self._q.put((route, x, fut))
        return futs

    def submit(self, x, src: Union[int, str], dst: Union[int, str], *,
               cond=None):
        """Enqueue one request; returns a concurrent.futures.Future.

        Requests larger than max_batch are split into max_batch-row chunks
        enqueued atomically; the returned future resolves to the
        re-concatenated result (or the first chunk's exception).

        Conditional models: pass `cond` (labels [B] or one-hot). The cond
        columns ride the queue hstacked onto x — [x | cond] — so the
        coalesce/min_batch-pad/chunk machinery is untouched (zero pad rows
        carry a zero soft condition); `_dispatch` splits them off again.
        """
        x = np.asarray(x)
        if x.ndim != 2:
            raise ValueError(f"expected [n, features] request, got {x.shape}")
        n_c = self.predictor.cfg.n_cond
        if n_c:
            c = bucketing.normalize_cond(cond, n_c, x.shape[0])
            x = np.concatenate([x.astype(np.float32), c], axis=1)
        elif cond is not None:
            raise ValueError("model is unconditional; drop `cond`")
        route = (
            self.predictor.cfg.modality_index(src),
            self.predictor.cfg.modality_index(dst),
        )
        if x.shape[0] <= self.max_batch:
            return self._enqueue(route, [x])[0]
        chunks = [x[lo : lo + self.max_batch]
                  for lo in range(0, x.shape[0], self.max_batch)]
        return _join_futures(self._enqueue(route, chunks))

    def cross_generate(self, x, src, dst, *, cond=None):
        """Blocking convenience wrapper over `submit`."""
        return self.submit(x, src, dst, cond=cond).result()

    def _worker(self):
        import queue
        import time as _time

        while True:
            item = self._q.get()
            if item is self._STOP:
                return
            batch = [item]
            rows = item[1].shape[0]
            deadline = _time.monotonic() + self.max_wait
            while rows < self.max_batch:
                # Dispatch as soon as a full batch accumulates — waiting out
                # the rest of the window would only add latency.
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is self._STOP:
                    self._flush(batch)
                    return
                batch.append(nxt)
                rows += nxt[1].shape[0]
            self._flush(batch)

    def _flush(self, batch):
        routes: dict = {}
        for route, x, fut in batch:
            routes.setdefault(route, []).append((x, fut))
        for (src, dst), items in routes.items():
            # Chunk so one device call never exceeds max_batch rows.
            chunk, rows = [], 0
            for x, fut in items:
                if chunk and rows + x.shape[0] > self.max_batch:
                    self._dispatch(src, dst, chunk)
                    chunk, rows = [], 0
                chunk.append((x, fut))
                rows += x.shape[0]
            if chunk:
                self._dispatch(src, dst, chunk)

    def _dispatch(self, src, dst, items):
        try:
            big = np.concatenate([x for x, _ in items], axis=0)
            if big.shape[0] < self.min_batch:
                big = np.concatenate(
                    [big, np.zeros((self.min_batch - big.shape[0],)
                                   + big.shape[1:], big.dtype)], axis=0
                )
            n_c = self.predictor.cfg.n_cond
            if n_c:
                # Split the hstacked [x | cond] columns (see submit()).
                big, cond = big[:, :-n_c], big[:, -n_c:]
                out = self.predictor.cross_generate(big, src, dst, cond=cond)
            else:
                out = self.predictor.cross_generate(big, src, dst)
            self.dispatches += 1
        except Exception as e:  # pragma: no cover - propagate to callers
            for _, fut in items:
                if not fut.done():
                    fut.set_exception(e)
            return
        lo = 0
        for x, fut in items:
            # A caller may have cancelled its future (they are never marked
            # running, so cancel always succeeds); that must not poison the
            # other requests' results in this chunk.
            if not fut.done():
                fut.set_result(out[lo : lo + x.shape[0]])
            lo += x.shape[0]

    def close(self):
        """Flush in-flight requests and stop the worker thread. Idempotent."""
        with self._lock:
            if not self._closed:
                self._closed = True
                self._q.put(self._STOP)
        self._thread.join()
        # Defense in depth: the lock makes a post-STOP enqueue impossible,
        # but if one ever slipped through, fail its future loudly rather
        # than leave a caller blocked on .result() forever.
        while not self._q.empty():
            item = self._q.get_nowait()
            if item is not self._STOP and not item[2].done():
                item[2].set_exception(RuntimeError("MicroBatcher is closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
