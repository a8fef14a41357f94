"""TCP line-protocol front-end for the serving Estimator.

The reference's deployment boundary is a Python API called by an
out-of-repo PostgreSQL plugin (`/root/reference/neuroestimator/README.md`,
`merge_subquery_card.py:74-79` — the DBMS side ships query files around).
This module goes one step further and makes the estimator a standalone
network service, so any client (a DBMS hook, a load generator, `nc`) can
stream cardinality estimates without linking Python.

Protocol (newline-delimited UTF-8, one request per line):
  request   a card-less query line in the serving grammar
            (`tables@preds_1@...@preds_k@joins`, single-table `preds`)
  response  one JSON object per line, in request order per connection:
            {"mean": m, "std": s, "card": 2**m}            always
            {"lo": .., "hi": .., "card_lo": .., "card_hi": ..}
                when `alpha` is set and the estimator has been
                `calibrate_uncertainty`'d (split-conformal bounds)
            {"error": "..."}                               per bad line

Concurrency: every connection gets a reader (submits lines to the shared
`StreamingBatcher`) and a writer (resolves futures in request order), so
requests from ALL connections coalesce into single device dispatches —
one TPU program serves any client mix. A malformed line poisons only its
own future: the batcher bisects failed batches (serve/streaming.py).
"""

import json
import queue
import socketserver
import threading
from typing import Optional

from nngp_tpu.serve.streaming import StreamingBatcher


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        srv: "EstimatorSocketServer" = self.server.owner  # type: ignore
        pending: "queue.SimpleQueue" = queue.SimpleQueue()

        def writer():
            while True:
                fut = pending.get()
                if fut is None:
                    return
                try:
                    mean, std = fut.result(timeout=srv.timeout_s)
                    resp = srv.format_response(mean, std)
                except Exception as e:  # noqa: BLE001 - reported to client
                    resp = {"error": f"{type(e).__name__}: {e}"}
                try:
                    self.wfile.write((json.dumps(resp) + "\n").encode())
                except (BrokenPipeError, ConnectionResetError, OSError):
                    return

        wt = threading.Thread(target=writer, daemon=True,
                              name="nngp-sock-writer")
        wt.start()
        try:
            for raw in self.rfile:
                line = raw.decode("utf-8", "replace").strip()
                if not line:
                    continue
                try:
                    pending.put(srv.batcher.submit(line))
                except RuntimeError:  # server closing
                    break
        except (ConnectionResetError, OSError):
            pass
        finally:
            pending.put(None)
            wt.join(timeout=srv.timeout_s)


class _TCPServer(socketserver.ThreadingTCPServer):
    daemon_threads = True
    allow_reuse_address = True


class EstimatorSocketServer:
    """Serve `estimator.predict` over TCP with cross-connection batching.

    estimator: anything with `.predict(lines) -> (means, stds)` — the
    serving `Estimator`; split-conformal intervals are attached when
    `alpha` is given and the estimator carries `_conformal_scores`
    (set by `Estimator.calibrate_uncertainty`).

    port=0 binds an ephemeral port (read `.port`). Context manager.
    """

    def __init__(self, estimator, host: str = "127.0.0.1", port: int = 0,
                 alpha: Optional[float] = None, timeout_s: float = 120.0,
                 **batcher_kwargs):
        self.estimator = estimator
        self.alpha = alpha
        self.timeout_s = float(timeout_s)
        self.batcher = StreamingBatcher(
            lambda lines: estimator.predict(list(lines)), **batcher_kwargs)
        self._tcp = _TCPServer((host, port), _Handler)
        self._tcp.owner = self  # type: ignore[attr-defined]
        self.host, self.port = self._tcp.server_address[:2]
        self._thread = threading.Thread(target=self._tcp.serve_forever,
                                        daemon=True, name="nngp-sock-accept")
        self._thread.start()

    def format_response(self, mean, std) -> dict:
        m, s = float(mean), float(std)
        resp = {"mean": m, "std": s, "card": float(2.0 ** m)}
        scores = getattr(self.estimator, "_conformal_scores", None)
        if self.alpha is not None and scores is not None:
            from nngp_tpu.eval.calibration import conformal_quantile
            qhat = conformal_quantile(scores, self.alpha)
            lo, hi = m - qhat * s, m + qhat * s
            resp.update(lo=lo, hi=hi, card_lo=float(2.0 ** lo),
                        card_hi=float(2.0 ** hi))
        return resp

    def stats(self) -> dict:
        return self.batcher.stats()

    def close(self, timeout: float = 10.0):
        self._tcp.shutdown()
        self._tcp.server_close()
        self.batcher.close(timeout=timeout)
        self._thread.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
