"""Native C++ UJI parser: build, parse, bit-parity with the Python parser."""

import os
import textwrap

import numpy as np
import pytest

from vae_assoc_tpu import native
from vae_assoc_tpu.data import uji

UJI_TEXT = textwrap.dedent(
    """\
    // UJIpenchars2 style fixture
    WORD a w01
      NUMSTROKES 2
        POINTS 3 # 10 20 11 21 12 22
        POINTS 2 # 30 40 31 41
    WORD b w01
      NUMSTROKES 1
        POINTS 4 # 1 2 3 4 5 6 7 8
    WORD a w02
      NUMSTROKES 1
        POINTS 400 # {}
    """
).format(" ".join(str(i % 97) for i in range(800)))


@pytest.fixture(scope="module")
def uji_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("uji") / "sample.txt"
    p.write_text(UJI_TEXT)
    return str(p)


def test_native_builds():
    if not native.available():
        pytest.skip("no g++ toolchain")
    assert os.path.exists(native.build())


def test_native_matches_python_bitwise(uji_file):
    if not native.available():
        pytest.skip("no g++ toolchain")
    ref = uji.load_uji_files([uji_file], max_points=256, native="never")
    got = uji.load_uji_files([uji_file], max_points=256, native="always")
    np.testing.assert_array_equal(got["points"], ref["points"])
    np.testing.assert_array_equal(got["lengths"], ref["lengths"])
    np.testing.assert_array_equal(got["labels"], ref["labels"])
    assert got["label_names"] == ref["label_names"]


def test_native_subsample_and_multistroke(uji_file):
    if not native.available():
        pytest.skip("no g++ toolchain")
    got = uji.load_uji_files([uji_file], max_points=64, native="always")
    # 3 samples: 'a' (5 pts), 'b' (4 pts), 'a' (400 → subsampled to 64)
    assert got["points"].shape == (3, 64, 2)
    np.testing.assert_array_equal(got["lengths"], [5, 4, 64])
    assert got["label_names"] == ["a", "b"]
    np.testing.assert_array_equal(got["labels"], [0, 1, 0])
    # y-flip applied
    assert got["points"][0, 0, 1] == -20.0


def test_native_error_paths(tmp_path):
    if not native.available():
        pytest.skip("no g++ toolchain")
    with pytest.raises(ValueError, match="cannot open"):
        native.parse_uji_file_native(str(tmp_path / "missing.txt"))
    bad = tmp_path / "bad.txt"
    bad.write_text("WORD x w\n POINTS 3 # 1 2 3 4\n")
    with pytest.raises(ValueError, match="header says 3"):
        native.parse_uji_file_native(str(bad))


def test_prepared_pickle_roundtrip(uji_file, tmp_path):
    data = uji.load_uji_files([uji_file], native="never")
    p = str(tmp_path / "prep.pkl")
    uji.save_prepared(p, data)
    back = uji.load_prepared(p)
    np.testing.assert_array_equal(back["points"], data["points"])
    assert back["label_names"] == data["label_names"]


def test_native_empty_file_matches_python(uji_file, tmp_path):
    """A comments-only file is a VALID empty parse (Python returns []);
    the native parser must agree instead of erroring — otherwise one such
    file silently kicks a whole multi-file load off the native path
    (round-2 review finding)."""
    if not native.available():
        pytest.skip("no native toolchain")
    empty = os.path.join(tmp_path, "comments_only.txt")
    with open(empty, "w") as f:
        f.write("// UJI v2 comments only\n//\n")
    r = native.parse_uji_file_native(empty, 64)
    assert r["points"].shape == (0, 64, 2) and list(r["names"]) == []
    both = uji.load_uji_files([uji_file, empty], native="always")
    ref = uji.load_uji_files([uji_file, empty], native="never")
    np.testing.assert_array_equal(both["points"], ref["points"])
    np.testing.assert_array_equal(both["lengths"], ref["lengths"])
    assert both["label_names"] == ref["label_names"]


def test_native_differential_fuzz(tmp_path):
    """Differential fuzz: on ANY input the C++ and Python parsers must agree
    on accept/reject and, on accept, be bit-identical. The Python twin's
    contract is regex-anchored (malformed WORD/POINTS lines are silently
    IGNORED, not errors; value conversion raises; count mismatch raises) —
    round-3 fuzzing found the native parser erroring where Python ignores,
    which would kick whole multi-file loads off the native path."""
    if not native.available():
        pytest.skip("no native toolchain")
    import random

    from vae_assoc_tpu.data.uji import _load_native, _load_python

    tokens = [
        "WORD", "NUMSTROKES", "POINTS", "#", "//", "a", "b", "w01", "",
        "0", "1", "2", "3", "-1", "4.5", "-7.25", "1e3", "nan", "inf",
        "x", "99999999999999999999", "POINTS 3 # 1 2 3 4 5 6",
        "WORD a w01", "NUMSTROKES 1", "POINTS 2 # 1 2 3 4",
        "POINTS 1 #5 6", "POINTS 0 #", "WORD", "POINTS -1 # 1 2",
        "POINTS x # 1 2", "POINTS 2 2 # 1 2 3 4", "\t", " ", "\r",
        "0x1A", "nan(12)", "infinity", "POINTS 1 # 1 2 x",
        "POINTS 1 #1 2", "+5", "5.", ".5", "1e", "007",
        "POINTS 007 # 1 2", "WORD\rPOINTS 1 # 1 2", "POINTS 1 # 1e999 2",
    ]
    rng = random.Random(0)
    path = str(tmp_path / "fuzz.txt")
    for case in range(400):
        n_lines = rng.randrange(0, 20)
        lines = [
            rng.choice(tokens) if rng.random() < 0.5
            else " ".join(rng.choice(tokens) for _ in range(rng.randrange(1, 6)))
            for _ in range(n_lines)
        ]
        text = "\n".join(lines) + ("\n" if rng.random() < 0.8 else "")
        with open(path, "w") as f:
            f.write(text)
        mp = rng.choice([4, 16, 64])
        try:
            py = _load_python([path], mp)
            py_err = None
        except Exception as e:
            py, py_err = None, e
        try:
            cc = _load_native([path], mp)
            cc_err = None
        except Exception as e:
            cc, cc_err = None, e
        assert (py is None) == (cc is None), (
            f"case {case}: accept/reject divergence py={py_err} cc={cc_err}\n"
            f"input: {text!r}"
        )
        if py is not None:
            (pp, pl, pn), (cp, cl, cn) = py[0], cc[0]
            assert pn == cn and np.array_equal(pl, cl) and np.array_equal(pp, cp), (
                f"case {case}: output divergence\ninput: {text!r}"
            )


def test_native_rejects_non_ascii(tmp_path):
    """The native parser's parity contract is bytes-are-ASCII (the C++
    twin tokenizes raw bytes; Python decodes UTF-8 and uses unicode-aware
    splitlines/regexes, so U+0085/U+2028/U+00A0/unicode digits could
    diverge). The dispatch boundary enforces it: native='always' raises
    loudly, 'auto' falls back to the Python parse (round-3 ADVICE)."""
    if not native.available():
        pytest.skip("no native toolchain")
    from vae_assoc_tpu.data.uji import _load_native, load_uji_files

    # U+0085 (NEL) inside a NUMSTROKES line: unicode-aware splitlines
    # breaks the line there, raw ASCII byte handling would not — exactly
    # the divergence class the guard exists for.
    text = "WORD a w01\nNUMSTROKES 1\u0085garbage\nPOINTS 2 # 1 2 3 4\n"
    p = tmp_path / "nel.txt"
    p.write_text(text, encoding="utf-8")
    with pytest.raises(ValueError, match="ASCII"):
        _load_native([str(p)], 16)
    auto = load_uji_files([str(p)], max_points=16, native="auto")
    never = load_uji_files([str(p)], max_points=16, native="never")
    assert auto["label_names"] == never["label_names"]
    np.testing.assert_array_equal(auto["points"], never["points"])
    np.testing.assert_array_equal(auto["lengths"], never["lengths"])

    # Pure-ASCII parse of the same shape stays on the native path.
    ok = tmp_path / "ok.txt"
    ok.write_text("WORD a w01\nNUMSTROKES 1\nPOINTS 2 # 1 2 3 4\n")
    (got,) = _load_native([str(ok)], 16)
    assert got[2] == ["a"]
