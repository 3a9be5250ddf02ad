"""Profiling hooks.

Parity target (and upgrade): the reference's ad-hoc wall-clock `time_info`
meters (compute/data per step feeding TensorBoard + ETA,
reference run_pretrain_ml.py:517,595-683) plus real device profiling the
reference lacked — jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class StepTimer:
    """data/compute split per step (the reference's time_info group)."""

    def __init__(self):
        self.t = {}
        self._mark = time.time()

    def mark(self, name: str):
        now = time.time()
        self.t[name] = self.t.get(name, 0.0) + (now - self._mark)
        self._mark = now

    def pop(self) -> Dict[str, float]:
        out, self.t = self.t, {}
        self._mark = time.time()
        return out


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace around a block; view in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside traced code (TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)
