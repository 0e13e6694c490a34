"""Profiling & model-cost reporting.

Functional parity surface: reference ``time_synchronized``
(utils/torch_utils.py:89), the per-layer ``profile=True`` path
(yolo_test.py:198-208, thop FLOPS), ``torch_utils.profile`` micro-bench and
``model_info`` — mapped onto XLA cost analysis + jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_synchronized() -> float:
    """Accurate wall time after draining pending device work
    (ref time_synchronized — cuda.synchronize + time)."""
    # effectful sync: transfer a trivial computation result
    jax.device_get(jnp.zeros(()))
    return time.perf_counter()


def model_cost(model, variables, *example_args, **apply_kw) -> dict:
    """FLOPs / bytes / params via XLA cost analysis (thop equivalent,
    ref torch_utils.model_info)."""
    def fwd(*args):
        return model.apply(variables, *args, **apply_kw)
    lowered = jax.jit(fwd).lower(*example_args)
    cost = lowered.compile().cost_analysis()
    n_params = sum(int(np.prod(x.shape)) for x in
                   jax.tree_util.tree_leaves(variables))
    return {
        "gflops": float(cost.get("flops", 0)) / 1e9,
        "bytes_accessed": float(cost.get("bytes accessed", 0)),
        "params_m": n_params / 1e6,
    }


def bench_fn(fn, *args, iters: int = 10) -> float:
    """Median seconds per call, properly synchronized."""
    out = fn(*args)
    jax.block_until_ready(out)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (TensorBoard-compatible).
    Ref: the reference's W&B/timing hooks; use ``xprof`` or TensorBoard's
    profile plugin on ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
