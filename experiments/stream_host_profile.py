"""Host-side streaming overhead profile (no device): stub predict_fn that
sleeps a fixed 45 ms (the measured 3.6k-batch device time), submit a 3600
burst exactly like bench.py, and report wall + p50/p95 + capture time.

Isolates the ~60 ms of non-device latency seen on chip
(streaming_p95 105.85 ms vs posterior_batch_s 45.6 ms, BENCH r3g): if the
stub reproduces it, the cost is producer/consumer GIL thrash during burst
capture, not the tunnel.

Run: PYTHONPATH=/root/repo python experiments/stream_host_profile.py
"""
import time

import numpy as np

from nngp_tpu.serve.streaming import StreamingBatcher

N = 3600
DEVICE_S = 0.045
rows = [np.zeros(61, dtype=np.float32) for _ in range(N)]

calls = []


def stub_predict(items):
    t0 = time.perf_counter()
    time.sleep(DEVICE_S)
    calls.append((len(items), time.perf_counter() - t0))
    z = np.zeros(len(items))
    return z, z


def run_once(**kw):
    calls.clear()
    with StreamingBatcher(stub_predict, max_batch=4096, **kw) as server:
        t0 = time.perf_counter()
        futs = [server.submit(r) for r in rows]
        t_submit = time.perf_counter() - t0
        for f in futs:
            f.result(timeout=30)
        wall = time.perf_counter() - t0
        st = server.stats()
    return wall, t_submit, st


# raw producer speed: how fast CAN the submit loop run with no consumer?
t0 = time.perf_counter()
_sink = []
for r in rows:
    _sink.append((r, None, time.monotonic()))
t_raw = time.perf_counter() - t0
print(f"raw 3600-tuple loop (no queue/Future): {t_raw*1e3:.1f} ms")

import concurrent.futures as cf
t0 = time.perf_counter()
_f = [cf.Future() for _ in range(N)]
print(f"3600 Future() creations: {(time.perf_counter()-t0)*1e3:.1f} ms")

for trial in range(3):
    wall, t_submit, st = run_once()
    print(f"[trial {trial}] wall {wall*1e3:.1f} ms  submit-loop "
          f"{t_submit*1e3:.1f} ms  batches {st['batches']} "
          f"p50 {st['p50_latency_ms']:.1f} p95 {st['p95_latency_ms']:.1f} "
          f"sizes {[c[0] for c in calls]}")

# GC hypothesis: a generational collection mid-burst pauses the producer
# longer than the quiet gap, fragmenting the capture.
import gc
print("-- with gc.disable() --")
gc.disable()
for trial in range(3):
    wall, t_submit, st = run_once()
    print(f"[gc-off {trial}] wall {wall*1e3:.1f} ms  submit-loop "
          f"{t_submit*1e3:.1f} ms  batches {st['batches']} "
          f"p50 {st['p50_latency_ms']:.1f} p95 {st['p95_latency_ms']:.1f} "
          f"sizes {[c[0] for c in calls]}")
gc.enable()
