"""Tracing/profiling harness (SURVEY.md section 5.1).

The reference has nothing beyond wall-clock scalars. Here:
- ``trace(dir)``: context manager around ``jax.profiler`` — produces a
  TensorBoard-loadable trace of the jitted steps (XLA ops, fusion, HBM);
- ``Timer``: block-until-ready wall-clock timing for the utts/sec/chip
  metric (BASELINE.json:2), median over steps;
- ``nan_check(enable)``: the debug-NaN toggle (SURVEY.md section 5.2) —
  under jit, XLA re-runs un-jitted on NaN detection and points at the
  producing primitive.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def nan_check(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


class Timer:
    """Median step timer; call .step() around jitted work."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def block(self, x):
        jax.block_until_ready(x)
        return x

    @property
    def median(self) -> float:
        return float(np.median(self.times)) if self.times else float("nan")

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.median if self.times else float("nan")
