"""Regression tests for the driver-graded entry points in __graft_entry__.py.

Round-1 failure mode (VERDICT.md Missing #1): the driver environment pins
JAX_PLATFORMS=axon (one real TPU chip through a tunnel), and
`dryrun_multichip(8)` raised "requested 8 devices, only 1 available" because
it never provisioned a virtual CPU mesh itself. The fix must happen
*in-process before any device query* — the env-var route does not work
(the axon plugin pre-registers at interpreter start) and post-init config
updates raise (`jax_num_cpu_devices`) or are silently ignored
(`jax_platforms`). These tests invoke the entry in a fresh subprocess with
the driver's environment shape so the bug class cannot regress unnoticed.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dryrun_subprocess(extra_env):
    env = dict(os.environ)
    # Strip the conftest-injected virtual-device flag: the entry point must
    # provision its own devices, exactly as under the driver's env.
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "xla_force_host_platform_device_count" not in f
    )
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    env.update(extra_env)
    code = (
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
        "print('DRYRUN_OK')\n"
    )
    return subprocess.run(
        [sys.executable, "-u", "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=580,
    )


@pytest.mark.parametrize(
    "platform_env",
    [
        {},  # whatever the outer environment pins (driver: axon)
        {"JAX_PLATFORMS": "cpu"},  # plain 1-device CPU default
    ],
    ids=["inherited-env", "cpu-env"],
)
def test_dryrun_multichip_self_provisions(platform_env):
    res = _run_dryrun_subprocess(platform_env)
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "DRYRUN_OK" in res.stdout


def test_dryrun_multichip_in_process():
    # Under pytest, conftest already provisioned 8 virtual CPU devices;
    # dryrun must detect that and run on them without touching config.
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_dryrun_errors_clearly_when_backends_frozen_small():
    # If backends initialized with too few devices, the error must say so
    # (not the round-1 "requested N devices" mesh error with no guidance).
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1\n"  # freeze backends at 1 device
        "import __graft_entry__\n"
        "try:\n"
        "    __graft_entry__.dryrun_multichip(8)\n"
        "except RuntimeError as e:\n"
        "    assert 'already' in str(e), str(e)\n"
        "    print('ERR_OK')\n"
    )
    env = dict(os.environ)
    flags = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    res = subprocess.run(
        [sys.executable, "-u", "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=580,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "ERR_OK" in res.stdout
