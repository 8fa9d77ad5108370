"""Fetch and cache the real UJI Pen Characters v2 dataset (UCI ML repo).

The reference builds both modalities from this dataset (SURVEY.md §0).
This environment has no network egress, so the file cannot be committed
here; run this script once on a networked machine (or copy the file in by
any other means) and every `--data uji` path picks it up from the cache.

    python scripts/fetch_uji.py [--dest ~/.cache/vae_assoc_tpu]
    python -m vae_assoc_tpu.train.driver --data uji \
        --uji-paths ~/.cache/vae_assoc_tpu/ujipenchars2.txt

The dataset is a single plain-text file in the UJI v2 format that
`vae_assoc_tpu.data.uji.parse_uji_text` reads (format documented there).
Until the real file is present, `tests/fixtures/ujipenchars2_format.txt`
— a format-faithful fixture generated from the synthetic stroke classes,
clearly labeled as such in its header — exercises the identical
text → parser → pipeline → training path.
"""

import argparse
import hashlib
import os
import sys
import urllib.request

# UCI Machine Learning Repository, "UJI Pen Characters (Version 2)".
URLS = [
    "https://archive.ics.uci.edu/ml/machine-learning-databases/uji-penchars/version2/ujipenchars2.txt",
]
FILENAME = "ujipenchars2.txt"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--dest",
        default=os.path.expanduser("~/.cache/vae_assoc_tpu"),
        help="cache directory (default: ~/.cache/vae_assoc_tpu)",
    )
    args = ap.parse_args(argv)
    os.makedirs(args.dest, exist_ok=True)
    out = os.path.join(args.dest, FILENAME)
    if os.path.exists(out):
        print(f"already cached: {out}")
        return 0
    last_err = None
    for url in URLS:
        try:
            print(f"fetching {url} ...", flush=True)
            with urllib.request.urlopen(url, timeout=60) as r:
                data = r.read()
            break
        except Exception as e:  # noqa: BLE001 — report and try the next mirror
            print(f"  failed: {e}", file=sys.stderr)
            last_err = e
    else:
        print(
            "Could not download UJIpenchars2 (no network egress?). Copy the "
            f"file to {out} manually; any UJI v2 text file works.",
            file=sys.stderr,
        )
        raise SystemExit(1 if last_err else 0)
    # Sanity-parse BEFORE caching: a 200-status HTML error page (common from
    # the UCI mirror) must not become a sticky "already cached" success that
    # later feeds `--data uji` an empty dataset.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vae_assoc_tpu.data.uji import parse_uji_text

    n = len(parse_uji_text(data.decode("utf-8", errors="replace")))
    if n == 0:
        print(
            "Downloaded content parsed to 0 UJI samples (error page or "
            "format change?) — not caching it.",
            file=sys.stderr,
        )
        raise SystemExit(1)
    sha = hashlib.sha256(data).hexdigest()
    with open(out, "wb") as f:
        f.write(data)
    print(f"cached {len(data)} bytes to {out}\nsha256: {sha}")
    print(f"parsed {n} character samples")
    return 0


if __name__ == "__main__":
    sys.exit(main())
