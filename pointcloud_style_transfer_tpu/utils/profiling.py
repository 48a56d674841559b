"""Profiling / tracing utilities (TPU equivalent of the reference's
memory_profiler + torch.cuda.max_memory_allocated harness,
examples/benchmark.py:15-50).

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing an
  XProf/TensorBoard trace;
* ``device_memory_stats()`` — live/peak HBM usage per device;
* ``annotate(name)`` — named trace region for the profiler timeline.
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a profiler trace viewable with TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in the profiler timeline (no-op overhead when idle)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict:
    """bytes_in_use / peak_bytes_in_use etc. for a device (the TPU analogue
    of torch.cuda.max_memory_allocated)."""
    dev = device or jax.local_devices()[0]
    try:
        return dict(dev.memory_stats() or {})
    except Exception:
        return {}


def enable_nan_debugging() -> None:
    """Raise on NaNs escaping jit boundaries — the numerical analogue of the
    reference's runtime clamp guards (training/validator.py:126-128)."""
    jax.config.update("jax_debug_nans", True)
