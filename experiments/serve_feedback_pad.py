"""Serving under load WHILE learning online: pad_slots A/B.

Query clients drive the TCP front-end at a fixed rate while a feedback
client submits labeled lines in ragged bursts (feedback_mode='online', so
each flushed batch extends the posterior mid-traffic). Without pad_slots
every extend changes the posterior shapes, so the append AND the next
predict bucket both recompile through the tunnel — multi-second stalls
that land in the query tail. With pad_slots the extends are bucketed
in-place appends and no shape ever changes.

Train set is a 2-file slice of synth6 (~6k lines) so the dense arm's
per-extend compiles stay minutes-bounded.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/serve_feedback_pad.py > experiments/serve_feedback_pad.log 2>&1 &
"""
import os
import shutil
import socket
import tempfile
import threading
import time

import numpy as np
import jax

from nngp_tpu.serve import Estimator, EstimatorSocketServer

print("devices:", jax.devices(), flush=True)

SRC = "workloads/synth6_join_data"
tmp = tempfile.mkdtemp(prefix="synth6_slice_")
for fn in ("join_query_2.txt", "join_query_3.txt"):
    shutil.copy(os.path.join(SRC, fn), tmp)

with open(os.path.join(SRC, "join_query_4.txt")) as f:
    _labeled = [l.strip() for l in f if l.strip()]
QUERIES = ["@".join(l.split("@")[:-1]) for l in _labeled[:2000]]
FEEDBACK = _labeled[2000:2400]
# ragged burst sizes — each DISTINCT size is a fresh compile without pads
BURSTS = (23, 57, 11, 38)

RATE = 2000.0
N_CONN = 3


def run_arm(pad_slots):
    est = Estimator("synth6", data_path=None, train_query_path=tmp,
                    stats_dir="workloads/synth6_stats", chunk_norm=True,
                    dtype=np.float32, verbose=False, pad_slots=pad_slots)
    est.load_model(verbose=False)
    est.warmup(max_batch=1024, verbose=False)
    est.predict_cache_size = 0          # every query reaches the device
    n0 = est.posterior.num_train
    print(f"arm pad_slots={pad_slots}: n={n0} warm", flush=True)

    stop = threading.Event()
    lats = [[] for _ in range(N_CONN)]

    def query_client(hostport, lat_out, idx):
        sends = []
        with socket.create_connection(hostport) as s:
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            buf, got, sent = b"", 0, 0
            s.settimeout(0.05)
            t0 = time.monotonic()
            while not stop.is_set():
                target = int((time.monotonic() - t0) * RATE / N_CONN) + 1
                while sent < target:
                    sends.append(time.monotonic())
                    s.sendall(QUERIES[(idx + sent) % len(QUERIES)]
                              .encode() + b"\n")
                    sent += 1
                try:
                    chunk = s.recv(1 << 16)
                    buf += chunk
                except socket.timeout:
                    continue
                while True:
                    nl = buf.find(b"\n")
                    if nl < 0:
                        break
                    buf = buf[nl + 1:]
                    lat_out.append(time.monotonic() - sends[got])
                    got += 1
            # drain what is still in flight
            s.settimeout(10.0)
            try:
                while got < sent:
                    chunk = s.recv(1 << 16)
                    if not chunk:
                        break
                    buf += chunk
                    while True:
                        nl = buf.find(b"\n")
                        if nl < 0:
                            break
                        buf = buf[nl + 1:]
                        lat_out.append(time.monotonic() - sends[got])
                        got += 1
            except socket.timeout:
                pass

    with EstimatorSocketServer(est, port=0, feedback_mode="online",
                               feedback_batch=64,
                               feedback_flush_s=0.3) as srv:
        hostport = (srv.host, srv.port)
        ths = [threading.Thread(target=query_client,
                                args=(hostport, lats[i], i * 311),
                                daemon=True) for i in range(N_CONN)]
        for t in ths:
            t.start()
        time.sleep(3.0)                  # steady-state before feedback
        off = 0
        with socket.create_connection(hostport) as fs:
            f = fs.makefile("rwb")
            for b in BURSTS:
                batch = FEEDBACK[off:off + b]
                off += b
                f.write(("".join(ln + "\n" for ln in batch)).encode())
                f.flush()
                for _ in batch:          # consume the queued-acks
                    f.readline()
                # wait for this burst's extend to land before the next
                deadline = time.monotonic() + 600
                while (est.posterior.num_train < n0 + off
                       and time.monotonic() < deadline):
                    time.sleep(0.2)
                print(f"  extend +{b} landed (n={est.posterior.num_train}) "
                      f"at t={time.monotonic():.0f}", flush=True)
        time.sleep(3.0)                  # steady-state after
        stop.set()
        for t in ths:
            t.join(timeout=30)
        st = srv.stats()
    all_l = np.asarray([v for ls in lats for v in ls]) * 1e3
    q = lambda p: float(np.quantile(all_l, p))  # noqa: E731
    print(f"arm pad_slots={pad_slots}: {all_l.size} replies  "
          f"p50 {q(.5):.1f}  p95 {q(.95):.1f}  p99 {q(.99):.1f}  "
          f"p99.9 {q(.999):.1f}  max {all_l.max():.0f} ms  "
          f"extends={st['extends']} errors={st['feedback_errors']} "
          f"final n={est.posterior.num_train}", flush=True)
    del est
    return all_l


run_arm(pad_slots=2048)
run_arm(pad_slots=None)
shutil.rmtree(tmp, ignore_errors=True)
print("done", flush=True)
