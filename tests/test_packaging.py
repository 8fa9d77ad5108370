"""Packaging metadata (pyproject.toml): the framework must be installable
as a standalone package. Validates the entry points resolve to real
callables, the declared package set matches the source tree, and the
native C++ source ships as package data (the .so is built on demand and
must stay out of the wheel). A full offline wheel build is exercised
manually (`pip wheel --no-deps --no-build-isolation --no-index .`)."""

import importlib
import os
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_pyproject_parses_and_has_core_metadata():
    d = _pyproject()
    assert d["project"]["name"] == "vae-assoc-tpu"
    assert d["project"]["version"]
    deps = " ".join(d["project"]["dependencies"])
    for lib in ("jax", "numpy", "optax", "orbax-checkpoint"):
        assert lib in deps, f"{lib} missing from dependencies"
    # TF/matplotlib are extras by design (oracle / viz only).
    assert "tensorflow" not in deps and "matplotlib" not in deps


def test_console_scripts_resolve_to_callables():
    for target in _pyproject()["project"]["scripts"].values():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn), target


def test_declared_packages_match_source_tree():
    """Every vae_assoc_tpu subdirectory with an __init__.py must be caught
    by the packages.find include glob (a new subpackage that setuptools
    would silently drop from the wheel fails here first)."""
    include = _pyproject()["tool"]["setuptools"]["packages"]["find"]["include"]
    assert include == ["vae_assoc_tpu*"]
    pkg_root = os.path.join(REPO, "vae_assoc_tpu")
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        assert "__init__.py" in filenames, (
            f"{dirpath} has no __init__.py — setuptools find() would drop "
            "it from the wheel"
        )


def test_native_source_ships_as_package_data():
    data = _pyproject()["tool"]["setuptools"]["package-data"]
    assert data["vae_assoc_tpu.native"] == ["*.cc"]
    assert os.path.exists(
        os.path.join(REPO, "vae_assoc_tpu", "native", "uji_parser.cc")
    )
