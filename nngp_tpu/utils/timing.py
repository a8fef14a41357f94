"""Structured timing (replaces the reference's ad-hoc datetime prints,
`/root/reference/train.py:170-176,191-195`).

Device work is asynchronous under JAX, so timings must block on result
readiness. `jax.block_until_ready` is not reliable on every PJRT plugin (the
axon tunnel backend treats it as a no-op), so `sync` forces completion by
reading one element of every array leaf back to the host — a dependent
gather + scalar transfer cannot complete before the producing computation.
"""

import time
from contextlib import contextmanager

import jax


def sync(tree):
    """Block until every array in `tree` is computed; returns `tree`.

    One element per leaf is gathered into a single device array and fetched
    with ONE blocking transfer: the tunnel to the TPU costs ~29 ms per
    blocking roundtrip on this image, so per-leaf fetches would multiply
    that floor into every measurement."""
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if isinstance(l, jax.Array)]
    if leaves:
        probes = jnp.stack(
            [l.ravel()[-1].astype(jnp.float32) for l in leaves])
        jax.device_get(probes)
    return tree


class Timer:
    def __init__(self):
        self.records = {}

    @contextmanager
    def measure(self, label: str):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if "out" in holder:
                sync(holder["out"])
            self.records[label] = time.perf_counter() - t0

    def report(self, printer=print):
        for label, secs in self.records.items():
            printer(f"[timing] {label}: {secs:.4f}s")


def timed(fn, *args, repeats: int = 1, **kwargs):
    """Run fn `repeats` times, sync each; return (result, best_seconds)."""
    best = float("inf")
    out = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = sync(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return out, best
