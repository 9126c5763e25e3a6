"""Observability: profiler traces and FLOPs/param audits.

Rebuilds the reference's tracing surface (SURVEY §5.1): wall-clock spans
and images/sec prints plus the ptflops/thop model audits
(``interfaces/base.py:372-377``, ``super_resolution.py:96-122``) — here
via the JAX profiler and XLA's own cost analysis, which reflect the real
compiled program rather than a torch module walk.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *example_args) -> dict:
    """FLOPs/bytes for the compiled ``fn`` (the ``cal_all_models``
    equivalent).  Returns {} when the backend hides cost analysis."""
    try:
        lowered = jax.jit(fn).lower(*example_args)
        compiled = lowered.compile()
        costs = compiled.cost_analysis()
        if isinstance(costs, list):
            costs = costs[0]
        return {
            "flops": float(costs.get("flops", -1)),
            "bytes_accessed": float(costs.get("bytes accessed", -1)),
        }
    except Exception:
        return {}


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def audit_model(name: str, apply_fn: Callable, variables, *example_args, log=print) -> dict:
    """Print complexity like the reference's model audit."""
    n_params = param_count(variables.get("params", variables))
    costs = cost_analysis(lambda *a: apply_fn(variables, *a), *example_args)
    flops = costs.get("flops")
    log(
        f"---------------- {name} -----------------\n"
        f"Number of parameters: {n_params/1e6:.2f} M\n"
        + (f"Computational complexity: {flops/1e9:.2f} GFLOPs\n" if flops and flops > 0 else "")
        + "--------------------------------------------"
    )
    return {"params": n_params, **costs}


class StepTimer:
    """images/sec meter with an explicit host-sync reading (on relay-attached
    accelerators ``block_until_ready`` returns at dispatch; callers should
    fetch a scalar before reading the rate)."""

    def __init__(self):
        self.t0 = time.time()
        self.images = 0

    def update(self, batch_size: int) -> None:
        self.images += batch_size

    def rate(self) -> float:
        dt = time.time() - self.t0
        return self.images / dt if dt > 0 else 0.0
