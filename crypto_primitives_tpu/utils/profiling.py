"""Profiling / tracing integration — the TPU twin of the reference's two
tracing mechanisms (SURVEY §5):

  * `#[tracing::instrument(target = "r1cs")]` per-gadget constraint tracing
    (e.g. reference src/sponge/poseidon/constraints.rs:38-107) -> here,
    named XLA trace annotations (`annotate`) that show up as spans in a
    captured device profile, plus `constraint_report` for the R1CS tier;
  * `ark-std` `start_timer!/end_timer!` scope timers behind the
    `print-trace` feature (src/crh/pedersen/mod.rs:65-126) -> `scope_timer`,
    enabled by CRYPTO_PRIMITIVES_PRINT_TRACE=1.

`capture` wraps `jax.profiler.trace`: it writes a TensorBoard/XProf trace
(device timelines, HLO cost attribution, Pallas kernel occupancy) under the
given directory.  Works on CPU and through the axon TPU tunnel (the trace
is host-written; no profiler server needed).
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

PRINT_TRACE = os.environ.get("CRYPTO_PRIMITIVES_PRINT_TRACE", "") == "1"


@contextlib.contextmanager
def capture(log_dir: str = "profiles"):
    """Capture a device/host profile of the enclosed block into `log_dir`
    (TensorBoard `plugins/profile/<run>` layout).  Usage:

        with profiling.capture("profiles"):
            out = permute_rns(plan, cfg, state)
            jax.block_until_ready(out)
    """
    with jax.profiler.trace(log_dir):
        yield log_dir


def annotate(name: str):
    """Named span visible in captured traces (gadget-level attribution,
    the `tracing::instrument` twin).  Usable as context manager."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def scope_timer(label: str, enabled: bool | None = None):
    """`start_timer!`/`end_timer!` twin; prints when enabled (or when
    CRYPTO_PRIMITIVES_PRINT_TRACE=1)."""
    on = PRINT_TRACE if enabled is None else enabled
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if on:
            dt = time.perf_counter() - t0
            print(f"[trace] {label}: {dt*1e3:.2f} ms", flush=True)


def constraint_report(cs) -> dict:
    """Constraint-count introspection (the reference uses
    `cs.num_constraints()` as a profiler in tests,
    src/merkle_tree/tests/constraints.rs:92-147)."""
    return {
        "num_constraints": cs.num_constraints,
        "num_witness_variables": cs.num_witness,
        "num_instance_variables": cs.num_instance,
    }
