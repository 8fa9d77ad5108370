"""Structured metrics logging: JSONL stream + console display.

The reference prints an average epoch cost every `display_step` epochs
(SURVEY.md §5 "Metrics/logging"). Here metrics are first-class jitted
outputs (the parity surface), and this module persists them: one JSON
object per record — {"step"/"epoch", every loss term, samples/sec} — so
runs are machine-comparable. No TensorBoard dependency; the JSONL is the
source of truth.
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

    def __init__(self, path: Optional[str] = None, *, echo: bool = False):
        self.path = path
        self.echo = echo
        self._fh: Optional[IO[str]] = None
        if path is not None:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)
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

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_jsonl(path: str) -> list:
    """Load a metrics JSONL file back into a list of dicts."""
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]
