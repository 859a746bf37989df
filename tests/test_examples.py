"""The examples/ scripts are executable documentation: run each one and
require its self-checks (parity asserts) to pass.  Mirrors the reference
keeping its doc examples compiling/running under `cargo test`."""

import os
import runpy
import subprocess
import sys

import pytest

_EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


@pytest.mark.parametrize(
    "script",
    [
        "quickstart_sponge.py",
        "merkle_membership.py",
        "sign_encrypt_commit.py",
        "sumcheck_protocol.py",
        "ipa_folding.py",
    ],
)
def test_example_runs(script):
    runpy.run_path(os.path.join(_EX, script), run_name="__main__")


def test_multichip_example_runs():
    # fresh process: the script must set the virtual-mesh XLA flag and pin
    # the CPU platform BEFORE jax initializes, which an in-process runpy
    # under this (already-initialized) test session cannot redo.
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the script sets its own device count
    subprocess.run(
        [sys.executable, os.path.join(_EX, "multichip_sharding.py")],
        check=True, env=env, timeout=300,
    )
