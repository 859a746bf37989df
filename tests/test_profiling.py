"""Profiling integration (utils/profiling.py) — the tracing/scope-timer
twins of the reference's `tracing::instrument` + `start_timer!` mechanisms
(SURVEY §5 aux subsystems)."""

import glob

import jax
import jax.numpy as jnp
import numpy as np

from crypto_primitives_tpu.r1cs import ConstraintSystem, FpVar
from crypto_primitives_tpu.ops.fields_known import BLS12_381_FR as FR
from crypto_primitives_tpu.utils import profiling


def test_capture_writes_xplane(tmp_path):
    d = str(tmp_path / "profiles")
    f = jax.jit(lambda x: jnp.sum(x * x))
    x = jnp.arange(1024, dtype=jnp.float32)
    np.asarray(f(x))  # compile outside the window
    with profiling.capture(d):
        with profiling.annotate("square_sum"):
            np.asarray(f(x))
    files = glob.glob(f"{d}/plugins/profile/*/*.xplane.pb")
    assert files, f"no xplane trace written under {d}"


def test_scope_timer_prints_when_enabled(capsys):
    with profiling.scope_timer("unit", enabled=True):
        pass
    assert "[trace] unit:" in capsys.readouterr().out
    with profiling.scope_timer("quiet", enabled=False):
        pass
    assert "quiet" not in capsys.readouterr().out


def test_constraint_report():
    cs = ConstraintSystem(FR)
    a = FpVar.new_witness(cs, 3)
    b = FpVar.new_witness(cs, 5)
    _ = a * b
    rep = profiling.constraint_report(cs)
    assert rep["num_constraints"] == 1
    assert rep["num_witness_variables"] == 3
    assert rep["num_instance_variables"] == 0
