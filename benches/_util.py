"""Shared bench utilities: honest timing under the axon TPU tunnel."""

import json
import time

import jax
import numpy as np

try:
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def timed(fn, *args, reps: int = 3) -> float:
    """Best-of-reps wall time; synchronizes via a host fetch of the (small)
    result — block_until_ready does not synchronize under the axon tunnel."""
    r = fn(*args)
    jax.tree_util.tree_map(np.asarray, r)  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def emit(metric: str, value: float, unit: str, baseline: float | None = None):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(float(value), 3),
                "unit": unit,
                "vs_baseline": round(float(value) / baseline, 4) if baseline else None,
            }
        ),
        flush=True,
    )
