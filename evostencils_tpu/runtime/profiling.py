"""Tracing / profiling utilities (SURVEY.md §5 'Tracing / profiling').

The reference instruments its generated solvers with ExaSlang
startTimer/stopTimer blocks and profiles the compiler with timeStrategies
(Helmholtz .exa4:4-18, Poisson .settings:20); its model-based path uses a
roofline as a stand-in for measurement (performance.py:36-48).  The TPU
equivalents here:

* :func:`trace` — jax.profiler trace context (view in TensorBoard/xprof);
* :func:`compiled_cost` — XLA's own FLOP/byte estimates from the compiled
  executable;
* :func:`benchmark` — compile-excluded wall-time of a jitted callable;
* :func:`roofline_report` — measured time vs the machine-model
  speed-of-light for a lowered cycle (per-kernel roofline).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax

from ..prediction.performance import (MachineModel, PerformanceEvaluator,
                                      TPU_V5E)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace of the enclosed block (device + host timelines)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn: Callable, *args) -> dict:
    """XLA cost analysis of the compiled executable: flops, bytes accessed,
    and derived arithmetic intensity."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):   # some backends wrap it in a list
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))
    return {
        "flops": flops,
        "bytes_accessed": bytes_accessed,
        "arithmetic_intensity": flops / bytes_accessed
        if bytes_accessed else float("inf"),
    }


def sync(out) -> None:
    """Force device completion of ``out`` (any pytree of arrays).

    ``jax.block_until_ready`` is NOT sufficient on relayed/async backends
    (the axon TPU tunnel acknowledges enqueue, not completion) — the only
    reliable barrier is a host transfer, so this fetches one scalar element
    of the first leaf.  Cost: one RPC round-trip (~25-30 ms on the tunnel),
    which is why :func:`benchmark` times a whole batch of calls between two
    sync points instead of syncing per call."""
    leaves = jax.tree_util.tree_leaves(out)
    if not leaves:
        return
    leaf = leaves[0]
    if getattr(leaf, "ndim", 0):
        leaf = leaf.ravel()[0]
    jax.device_get(leaf)


def benchmark(fn: Callable, *args, iterations: int = 10,
              warmup: int = 2) -> float:
    """Mean wall time per call (seconds) of a jitted callable, compile
    excluded.  All ``iterations`` calls are enqueued back-to-back and a
    single :func:`sync` closes the timed window, so per-call dispatch/RPC
    latency is amortized (the per-call figure is an average, not a
    median)."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iterations):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iterations


@dataclass
class RooflineReport:
    measured_s: float
    model_s: float          # machine-model speed-of-light for the cycle
    efficiency: float       # model / measured (1.0 == at the roofline)
    machine: str


def roofline_report(lowered, u, b, omegas, *,
                    machine: MachineModel = TPU_V5E,
                    expression=None, iterations: int = 10) -> RooflineReport:
    """Measured cycle time vs the analytic roofline of its expression.

    ``lowered`` is a compiler.lower.LoweredCycle; ``expression`` defaults
    to the cycle it was lowered from.
    """
    expr = expression if expression is not None else lowered.expression
    model_s = PerformanceEvaluator(machine).estimate_runtime(expr)
    step = jax.jit(lowered.step)
    measured = benchmark(step, u, b, omegas, iterations=iterations)
    return RooflineReport(measured, model_s,
                          model_s / measured if measured else 0.0,
                          machine.name)
