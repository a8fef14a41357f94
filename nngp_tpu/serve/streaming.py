"""Streaming / continuous-batching front-end for the serving estimator.

The reference's serving API is strictly synchronous batch-at-a-time
(`/root/reference/neuroestimator/estimator/estimator.py:42-61` — the
PostgreSQL plugin hands over one list of sub-query lines per call). On this
image's TPU every blocking dispatch costs a ~30 ms tunnel roundtrip, so
per-request dispatch caps a naive server at ~30 qps while one 4k-row batch
serves 4k requests in the SAME roundtrip. This module closes that gap for
concurrent clients: requests from any thread are enqueued, a dispatcher
coalesces them into batches, runs ONE device dispatch per batch, and
resolves per-request futures.

Batching policy (tuned round 3 against measured tunnel costs,
experiments/tunnel_costs.py): device dispatch is asynchronous and free, but
every result fetch is a ~27 ms serialized roundtrip — two in-flight batches
do NOT overlap their fetches, so pipelining materialization on a second
thread buys nothing here (and cross-thread lazy fetches measured
pathologically slow on the axon client). The latency-optimal policy is
therefore synchronous with QUIET-GAP burst capture:

  - while requests keep arriving within `quiet_gap_ms` of each other, keep
    draining — an active burst is absorbed into ONE dispatch instead of a
    tiny head batch plus a giant tail batch that waits two service cycles
    (shipping early at a fixed batch size measured p95 = 150-165 ms for a
    3.6k burst vs ~one service time for the whole-burst batch);
  - once the queue stays quiet for a gap, ship immediately — a trickle
    load pays only the gap (~2 ms), not the full SLO window;
  - `max_wait_ms` (measured from the batch's first item) bounds the wait
    under sustained arrival, and `max_batch` caps device memory.

Generic over the request payload: `predict_fn(items) -> (mean, std)` — pass
`Estimator.predict` for query-line items (its power-of-two bucketing keeps
compiled-shape reuse), or any row-wise batch function.
"""

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np


class StreamingBatcher:
    """Continuous batching: submit() returns a Future resolving to
    (mean, std) for that single item; a background dispatcher coalesces
    outstanding items into one predict_fn call per batch.

    max_batch caps device memory per dispatch; quiet_gap_ms is how long the
    queue must stay quiet before a partial batch ships (burst-vs-trickle
    detector); max_wait_ms (from the batch's first item) bounds the total
    wait under sustained arrival.
    """

    def __init__(self, predict_fn: Callable[[List], Tuple], *,
                 max_batch: int = 4096, max_wait_ms: float = 25.0,
                 quiet_gap_ms: float = 2.0,
                 name: str = "nngp-stream"):
        self._predict_fn = predict_fn
        self._max_batch = int(max_batch)
        self._max_wait_s = float(max_wait_ms) / 1e3
        self._quiet_gap_s = float(quiet_gap_ms) / 1e3
        self._queue: "queue.SimpleQueue" = queue.SimpleQueue()
        self._running = True
        self._lock = threading.Lock()
        self._submit_lock = threading.Lock()
        # metrics
        self._n_requests = 0
        self._n_batches = 0
        self._batch_sizes: deque = deque(maxlen=4096)
        self._latencies: deque = deque(maxlen=65536)
        self._started = time.monotonic()
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        name=name, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- client
    def submit(self, item) -> Future:
        """Enqueue one request; resolves to (mean, std) scalars."""
        fut: Future = Future()
        # _submit_lock pairs with close(): no request can slip past the
        # _running check after close() decided the final drain. It is
        # uncontended on the hot path (producers only race close()).
        with self._submit_lock:
            if not self._running:
                raise RuntimeError("StreamingBatcher is closed")
            self._queue.put((item, fut, time.monotonic()))
        return fut

    def predict(self, items: Sequence) -> Tuple[np.ndarray, np.ndarray]:
        """Synchronous convenience: submit all, wait for all."""
        futs = [self.submit(it) for it in items]
        out = [f.result() for f in futs]
        means = np.asarray([m for m, _ in out])
        stds = np.asarray([s for _, s in out])
        return means, stds

    # --------------------------------------------------------- dispatcher
    def _drain_batch(self) -> Optional[List]:
        """Block for the first item, then keep draining while requests keep
        arriving within the quiet gap; ship when the queue stays quiet, the
        SLO window closes, or the batch fills."""
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return None
        batch = [first]
        deadline = time.monotonic() + self._max_wait_s
        while len(batch) < self._max_batch:
            try:
                while len(batch) < self._max_batch:
                    batch.append(self._queue.get_nowait())
            except queue.Empty:
                pass
            if len(batch) >= self._max_batch:
                break
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break                       # SLO window closed
            try:
                batch.append(self._queue.get(
                    timeout=min(self._quiet_gap_s, remaining)))
            except queue.Empty:
                break                       # queue went quiet: ship now
        return batch

    def _dispatch_loop(self):
        while self._running or not self._queue.empty():
            batch = self._drain_batch()
            if not batch:
                continue
            items = [b[0] for b in batch]
            futs = [b[1] for b in batch]
            t_enq = [b[2] for b in batch]
            self._resolve(items, futs, t_enq)

    # A client may cancel its Future at any moment; an unguarded
    # set_result/set_exception on a cancelled future raises
    # InvalidStateError OUT of the dispatcher loop and kills the daemon
    # thread — every later request would then hang forever.
    @staticmethod
    def _safe_set(fut: Future, result=None, exc=None):
        try:
            if exc is not None:
                fut.set_exception(exc)
            else:
                fut.set_result(result)
        except Exception:
            pass

    def _resolve(self, items, futs, t_enq):
        """Predict a batch and resolve its futures. On failure, BISECT:
        the bad requests are isolated in O(k log n) sub-dispatches instead
        of n serial per-item retries (one malformed line in a 4k batch
        would otherwise stall coalescing for ~n tunnel roundtrips)."""
        try:
            mean, std = self._predict_fn(items)
            mean = np.asarray(mean).ravel()
            std = np.asarray(std).ravel()
            if mean.shape[0] != len(items):
                # e.g. Estimator.predict silently drops blank lines —
                # resolving positionally would hand each later client
                # its neighbor's prediction. Fail the batch loudly.
                raise ValueError(
                    f"predict_fn returned {mean.shape[0]} results for "
                    f"{len(items)} requests (did it drop empty items?)")
            done = time.monotonic()
            with self._lock:
                self._n_requests += len(items)
                self._n_batches += 1
                self._batch_sizes.append(len(items))
                self._latencies.extend(done - t for t in t_enq)
            mvals, svals = mean.tolist(), std.tolist()
            for f, m, s in zip(futs, mvals, svals):
                self._safe_set(f, result=(float(m), float(s)))
        except Exception as e:
            if len(items) == 1:
                self._safe_set(futs[0], exc=e)
                return
            mid = len(items) // 2
            self._resolve(items[:mid], futs[:mid], t_enq[:mid])
            self._resolve(items[mid:], futs[mid:], t_enq[mid:])

    # -------------------------------------------------------------- admin
    def stats(self) -> dict:
        with self._lock:
            lat = np.asarray(self._latencies, dtype=np.float64)
            sizes = np.asarray(self._batch_sizes, dtype=np.float64)
            elapsed = time.monotonic() - self._started
            return {
                "requests": self._n_requests,
                "batches": self._n_batches,
                "qps": self._n_requests / elapsed if elapsed > 0 else 0.0,
                "mean_batch": float(sizes.mean()) if sizes.size else 0.0,
                "p50_latency_ms": (float(np.quantile(lat, 0.5)) * 1e3
                                   if lat.size else 0.0),
                "p95_latency_ms": (float(np.quantile(lat, 0.95)) * 1e3
                                   if lat.size else 0.0),
                "p99_latency_ms": (float(np.quantile(lat, 0.99)) * 1e3
                                   if lat.size else 0.0),
            }

    def close(self, timeout: float = 10.0):
        """Stop accepting requests, drain the queue, join the dispatcher.
        Anything still unresolved afterwards (dispatcher hung past the
        timeout) gets its future failed rather than left hanging."""
        with self._submit_lock:
            self._running = False
        self._thread.join(timeout=timeout)
        # Fail any leftovers so no client blocks forever on fut.result().
        try:
            while True:
                _, fut, _ = self._queue.get_nowait()
                self._safe_set(fut, exc=RuntimeError(
                    "StreamingBatcher closed before this request was "
                    "dispatched"))
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
