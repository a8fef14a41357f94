"""Structured profiling (replaces the reference's stdout datetime prints —
SURVEY.md section 5 'tracing/profiling').

`trace(dir)` wraps a block in a jax.profiler trace viewable in TensorBoard /
Perfetto; `Metrics` accumulates named scalars and dumps one JSON object —
the machine-readable counterpart of the reference's print-based timers.
"""

import json
import time
from contextlib import contextmanager

import jax


@contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a block (device + host timelines)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class Metrics:
    def __init__(self):
        self._values = {}

    def record(self, name: str, value):
        self._values[name] = value

    @contextmanager
    def timeit(self, name: str, block_on=None):
        from nngp_tpu.utils.timing import sync
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            sync(holder.get("out", block_on))
            self._values[f"{name}_s"] = time.perf_counter() - t0

    def dump(self, path=None):
        payload = json.dumps(self._values, default=float)
        if path:
            with open(path, "w") as f:
                f.write(payload)
        return payload
