"""FULL-STACK sustained serving: open-loop load through the TCP front-end.

serve_sustained.py measured the StreamingBatcher over pre-encoded rows;
this drives the whole production path — raw card-less query lines over a
socket, native C++ encode, bucketed device predict, JSON replies — with
clock-paced arrivals across several connections. Client-side latency is
send-time -> matching reply line (per-connection replies are in request
order), so it includes TCP, parse, encode, batching, device, and JSON.

Client threads run on the same 1-core host as the server (this image has
one core), so very high offered rates under-deliver from CLIENT cpu — the
achieved column is the honest number.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
  experiments/socket_sustained.py > experiments/socket_sustained.log 2>&1 &
"""
import socket
import threading
import time

import numpy as np
import jax

from nngp_tpu.serve import Estimator, EstimatorSocketServer

print("devices:", jax.devices(), flush=True)
est = Estimator("synth6", data_path=None,
                train_query_path="workloads/synth6_join_data",
                stats_dir="workloads/synth6_stats", chunk_norm=True,
                dtype=np.float32, verbose=False)
est.load_model(verbose=False)
est.warmup(max_batch=4096, verbose=False)
print("estimator ready (buckets warm)", flush=True)

# card-less serving lines from the test query file
with open("workloads/synth6_join_data/join_query_3.txt") as f:
    LINES = ["@".join(l.strip().split("@")[:-1])
             for l in f if l.strip()][:4000]
print(f"{len(LINES)} serving lines", flush=True)

N_CONN = 4
RATES = (1000, 4000, 8000, 16000)
SECS = 10.0


def client(hostport, rate, n_total, lat_out, idx):
    """One connection: paced sender + reader matching replies in order."""
    sends = []
    done = threading.Event()

    def reader(sock):
        got = 0
        buf = b""
        while got < n_total:
            chunk = sock.recv(1 << 16)
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
        done.set()

    with socket.create_connection(hostport) as s:
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        rt = threading.Thread(target=reader, args=(s,), daemon=True)
        rt.start()
        t0 = time.monotonic()
        sent = 0
        while sent < n_total:
            target = min(n_total, int((time.monotonic() - t0) * rate) + 1)
            while sent < target:
                line = LINES[(idx + sent) % len(LINES)]
                sends.append(time.monotonic())
                s.sendall(line.encode() + b"\n")
                sent += 1
            time.sleep(0.001)
        done.wait(timeout=120)


# Two traffic models: memo ON approximates PostgreSQL plan enumeration
# (the same sub-queries recur across plan candidates — repeats are LRU
# hits, Estimator.predict_cache_size); memo OFF forces every request
# through encode + device, the worst-case all-distinct stream.
for memo in (True, False):
    est.predict_cache_size = 4096 if memo else 0
    est._pred_cache.clear()
    print(f"-- memo {'ON (plan-enumeration traffic)' if memo else 'OFF'}",
          flush=True)
    print(f"{'rate':>7} {'achieved':>9} {'p50ms':>7} {'p95ms':>7} "
          f"{'p99ms':>7} {'batches':>8} {'meanB':>7}", flush=True)
    for rate in RATES:
        with EstimatorSocketServer(est, port=0) as srv:
            per_conn = int(rate * SECS / N_CONN)
            lats = [[] for _ in range(N_CONN)]
            t0 = time.monotonic()
            ths = [threading.Thread(
                target=client, args=((srv.host, srv.port), rate / N_CONN,
                                     per_conn, lats[i], i * 1000))
                for i in range(N_CONN)]
            for t in ths:
                t.start()
            for t in ths:
                t.join(timeout=180)
            wall = time.monotonic() - t0
            st = srv.stats()
        all_l = np.asarray([v for ls in lats for v in ls]) * 1e3
        n_done = all_l.size
        print(f"{rate:>7} {n_done / wall:>9.0f} "
              f"{np.quantile(all_l, .5):>7.1f} "
              f"{np.quantile(all_l, .95):>7.1f} "
              f"{np.quantile(all_l, .99):>7.1f} "
              f"{st['batches']:>8} {st['mean_batch']:>7.0f}", flush=True)
print("done", flush=True)
