"""The examples/ scripts are executable documentation: run each one and
require its self-checks (parity asserts) to pass.  Mirrors the reference
keeping its doc examples compiling/running under `cargo test`."""

import os
import runpy

import pytest

_EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


@pytest.mark.parametrize(
    "script",
    [
        "quickstart_sponge.py",
        "merkle_membership.py",
        "sign_encrypt_commit.py",
        "sumcheck_protocol.py",
    ],
)
def test_example_runs(script):
    runpy.run_path(os.path.join(_EX, script), run_name="__main__")
