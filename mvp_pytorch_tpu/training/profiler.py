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


def device_memory_gb(device=None) -> Dict[str, float]:
    """Runtime device-memory telemetry (the reference logs
    torch.cuda.max_memory_allocated() on every log line,
    reference run_pretrain_ml.py:682).

    Prefers the runtime allocator stats (`device.memory_stats()` —
    peak/in-use/limit, available on real TPU runtimes); platforms that
    return None (CPU, tunneled devices) fall back to the sum of live
    jax.Array bytes on the device — a live-buffer lower bound, labeled
    distinctly so a trend reader knows which signal it is.
    """
    import jax
    if device is None:
        device = jax.local_devices()[0]
    gb = 1024.0 ** 3
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    if stats:
        out = {}
        if "peak_bytes_in_use" in stats:
            out["hbm_peak_gb"] = stats["peak_bytes_in_use"] / gb
        if "bytes_in_use" in stats:
            out["hbm_gb"] = stats["bytes_in_use"] / gb
        if "bytes_limit" in stats:
            out["hbm_limit_gb"] = stats["bytes_limit"] / gb
        if out:
            return out
    try:
        live = sum(a.nbytes for a in jax.live_arrays()
                   if device in getattr(a, "devices", lambda: set())())
        return {"hbm_live_gb": live / gb}
    except Exception:
        return {}


def compiled_memory_gb(compiled) -> Dict[str, float]:
    """Static per-step memory from XLA's buffer assignment
    (jax Compiled.memory_analysis()): the compiler-exact peak the step
    needs — argument (params+opt state+batch), temp (activations), and
    overall peak. Works on every backend including tunneled TPUs where
    memory_stats() is unavailable."""
    gb = 1024.0 ** 3
    try:
        ma = compiled.memory_analysis()
        if ma is None:
            return {}
        out = {}
        for field, key in (("peak_memory_in_bytes", "step_peak_gb"),
                           ("argument_size_in_bytes", "step_args_gb"),
                           ("temp_size_in_bytes", "step_temp_gb"),
                           ("output_size_in_bytes", "step_out_gb")):
            v = getattr(ma, field, None)
            if v is not None:
                out[key] = float(v) / gb
        return out
    except Exception:
        return {}


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
