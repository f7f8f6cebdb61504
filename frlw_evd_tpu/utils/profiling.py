"""Profiling helpers — the TPU equivalents of the reference's ad-hoc
CUDA-synced wall-clock spans and thop FLOPs counts (SURVEY.md §5):

  * Timer: `jax.block_until_ready`-fenced wall-clock spans
  * flops_report: compiled-HLO cost analysis (replaces thop/get_model_info,
    core/yolox/utils/model_utils.py:19-28)
  * trace: context manager around jax.profiler for deep dives
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


class Timer:
    """Wall-clock span with device fencing.

    >>> t = Timer()
    >>> with t.span("step"):
    ...     out = step(x)  # block_until_ready applied on exit
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._last_result = None

    @contextlib.contextmanager
    def span(self, name: str, result=None):
        start = time.perf_counter()
        try:
            yield self
        finally:
            if self._last_result is not None:
                jax.block_until_ready(self._last_result)
                self._last_result = None
            elapsed = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + elapsed
            self.counts[name] = self.counts.get(name, 0) + 1

    def fence(self, result):
        """Mark a device result to block on when the span exits."""
        self._last_result = result
        return result

    def avg_ms(self, name: str) -> float:
        return 1000.0 * self.totals.get(name, 0.0) / max(self.counts.get(name, 1), 1)

    def report(self) -> str:
        return ", ".join(f"{k}: {self.avg_ms(k):.2f} ms"
                         for k in sorted(self.totals))


def flops_report(fn: Callable, *args, **kwargs) -> Dict[str, Any]:
    """FLOPs / memory traffic of a jitted function from XLA cost analysis."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0] if cost else {}
    return {
        "flops": cost.get("flops", float("nan")),
        "bytes_accessed": cost.get("bytes accessed", float("nan")),
        "peak_memory_mb": compiled.memory_analysis().output_size_in_bytes / 1e6
        if hasattr(compiled, "memory_analysis") else float("nan"),
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """jax.profiler trace (view with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
