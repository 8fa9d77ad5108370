"""Structured metrics logging: JSONL stream + console display.

The reference prints an average epoch cost every `display_step` epochs
(SURVEY.md §5 "Metrics/logging"). Here metrics are first-class jitted
outputs (the parity surface), and this module persists them: one JSON
object per record — {"step"/"epoch", every loss term, samples/sec} — so
runs are machine-comparable. The JSONL is the source of truth; TensorBoard
event files are an *optional tee* (``tensorboard_dir=``, SURVEY.md §5
"JSONL + optional TensorBoard") written via tf.summary when TensorFlow is
importable, and a named error otherwise.
"""

from __future__ import annotations

import json
import os
import time
from typing import IO, Optional


class MetricsLogger:
    """Append-only JSONL metrics writer with optional console echo.

    Usage:
        with MetricsLogger(path, echo=True) as log:
            log.write(epoch=3, **metrics)
    """

    def __init__(
        self,
        path: Optional[str] = None,
        *,
        echo: bool = False,
        tensorboard_dir: Optional[str] = None,
    ):
        self.path = path
        self.echo = echo
        self._fh: Optional[IO[str]] = None
        if path is not None:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self._tb = TensorBoardWriter(tensorboard_dir) if tensorboard_dir else None
        self._n = 0
        self._t0 = time.time()

    def write(self, **record) -> dict:
        rec = {"t": round(time.time() - self._t0, 3)}
        for k, v in record.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            # TB needs a monotone step: the record's epoch/step if present,
            # else the running record count.
            step = rec.get("epoch", rec.get("step", self._n))
            self._tb.write(int(step), **rec)
        self._n += 1
        if self.echo:
            shown = {
                k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in rec.items()
                if k != "t"
            }
            print(" ".join(f"{k}={v}" for k, v in shown.items()), flush=True)
        return rec

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class TensorBoardWriter:
    """Scalar event-file writer via ``tf.summary`` (opt-in).

    TensorFlow is an oracle/benchmark-only dependency of this project, so
    it is imported lazily here; constructing the writer without TF
    installed raises a named RuntimeError rather than an import traceback.
    """

    def __init__(self, logdir: str):
        try:
            import tensorflow as tf
        except Exception as e:  # pragma: no cover - env without TF
            raise RuntimeError(
                "TensorBoard logging requires tensorflow (used only as the "
                "event-file writer); install it or drop tensorboard_dir"
            ) from e
        self._tf = tf
        self._writer = tf.summary.create_file_writer(logdir)

    def write(self, step: int, **record) -> None:
        with self._writer.as_default(step=step):
            for k, v in record.items():
                if isinstance(v, (int, float)) and k not in ("t",):
                    self._tf.summary.scalar(k, float(v))
        self._writer.flush()

    def close(self) -> None:
        self._writer.close()


def read_jsonl(path: str) -> list:
    """Load a metrics JSONL file back into a list of dicts."""
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]
