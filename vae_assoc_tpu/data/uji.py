"""UJI Pen Characters (v2) parser.

The reference derives both modalities from the UJI Pen Characters v2
online-handwriting dataset (SURVEY.md §0, §3.4): per-character pen-tip
coordinate sequences, from which it builds rasterized images and
resampled flattened trajectories.

UJI v2 is a plain-text format (UCI ML repository, "UJIpenchars2"):

    //comment lines
    WORD <character> <writer-tag>
      NUMSTROKES <k>
        POINTS <n> # <x1> <y1> <x2> <y2> ... <xn> <yn>
        ... (k POINTS lines)

This parser is written from the public format description; it reads
sessions into the same padded raw-stroke structure the synthetic
generator produces, concatenating multi-stroke characters into one
polyline (the reference flattens strokes the same way before
resampling). No network access is assumed — pass local file paths.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

_WORD_RE = re.compile(r"^\s*WORD\s+(\S+)\s*(\S*)")
_NUMSTROKES_RE = re.compile(r"^\s*NUMSTROKES\s+(\d+)")
_POINTS_RE = re.compile(r"^\s*POINTS\s+(\d+)\s*#\s*(.*)$")


def parse_uji_text(text: str) -> List[Tuple[str, List[np.ndarray]]]:
    """Parse UJI v2 text → list of (character, [stroke arrays [n_i, 2]])."""
    samples: List[Tuple[str, List[np.ndarray]]] = []
    char: Optional[str] = None
    strokes: List[np.ndarray] = []
    expected = 0
    for line in text.splitlines():
        if line.lstrip().startswith("//"):
            continue
        m = _WORD_RE.match(line)
        if m:
            if char is not None and strokes:
                samples.append((char, strokes))
            char = m.group(1)
            strokes = []
            expected = 0
            continue
        m = _NUMSTROKES_RE.match(line)
        if m:
            expected = int(m.group(1))
            continue
        m = _POINTS_RE.match(line)
        if m:
            n = int(m.group(1))
            vals = np.array(m.group(2).split(), dtype=np.float64)
            if vals.size != 2 * n:
                raise ValueError(
                    f"POINTS header says {n} points but line has {vals.size} values"
                )
            strokes.append(vals.reshape(n, 2).astype(np.float32))
    if char is not None and strokes:
        samples.append((char, strokes))
    return samples


def load_uji_files(
    paths: Sequence[str],
    *,
    max_points: int = 256,
    charset: Optional[Iterable[str]] = None,
):
    """Load UJI files into the padded raw-stroke structure.

    Multi-stroke characters are concatenated into one polyline (pen-up
    segments become straight connecting segments, as in the reference's
    flattening). Characters longer than `max_points` are uniformly
    subsampled to fit, preserving endpoints.

    Returns dict(points [N, max_points, 2] f32, lengths [N] i32,
    labels [N] i32, label_names list[str]).
    """
    samples: List[Tuple[str, List[np.ndarray]]] = []
    for p in paths:
        with open(p, "r", encoding="utf-8", errors="replace") as f:
            samples.extend(parse_uji_text(f.read()))
    if charset is not None:
        allowed = set(charset)
        samples = [s for s in samples if s[0] in allowed]
    if not samples:
        raise ValueError("no samples parsed from UJI files")

    label_names = sorted({c for c, _ in samples})
    label_map = {c: i for i, c in enumerate(label_names)}

    n = len(samples)
    points = np.zeros((n, max_points, 2), np.float32)
    lengths = np.empty((n,), np.int32)
    labels = np.empty((n,), np.int32)
    for i, (c, strokes) in enumerate(samples):
        poly = np.concatenate(strokes, axis=0)
        if len(poly) > max_points:
            idx = np.linspace(0, len(poly) - 1, max_points).round().astype(int)
            poly = poly[idx]
        # UJI y grows downward (tablet coords); flip so y is up like the
        # synthetic generator, pipeline normalization rescales anyway.
        poly = poly * np.array([1.0, -1.0], np.float32)
        points[i, : len(poly)] = poly
        points[i, len(poly):] = poly[-1]
        lengths[i] = len(poly)
        labels[i] = label_map[c]
    return {
        "points": points,
        "lengths": lengths,
        "labels": labels,
        "label_names": label_names,
    }
