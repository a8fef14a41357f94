"""Serving smoke script — the `neuroestimator/estimator_test.py` equivalent
(`/root/reference/neuroestimator/estimator_test.py:1-44`): build an
Estimator, warm it up, strip cards from a query file, predict, print shapes
and latency.

    python -m nngp_tpu.cli.serve_demo --schema_name imdb_simple \
        --data_path /data/imdb_clean --train_query_path /data/queries \
        --test_query_file /data/queries/join_query_2.txt
"""

import argparse
import sys
import time


def load_query_lines_without_card(path: str, limit=None):
    """Strip the trailing @card from labeled lines
    (`estimator_test.py:13-20`)."""
    lines = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            lines.append(line.rsplit("@", 1)[0])
            if limit and len(lines) >= limit:
                break
    return lines


def build_parser():
    p = argparse.ArgumentParser(
        "nngp_tpu serving demo",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--schema_name", type=str, required=True)
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--stats_dir", type=str, default=None,
                   help="dir of TableStats JSONs (serving without CSVs)")
    p.add_argument("--train_query_path", type=str, required=True)
    p.add_argument("--test_query_file", type=str, default=None,
                   help="required unless --listen is given")
    p.add_argument("--chunk_size", type=int, default=64)
    p.add_argument("--use_aux", action="store_true")
    p.add_argument("--q_error_threshold", type=float, default=100.0)
    p.add_argument("--coef_var_threshold", type=float, default=1.0)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--ckpt", type=str, default=None,
                   help="save/restore checkpoint dir")
    p.add_argument("--streaming", action="store_true",
                   help="also drive the continuous-batching front-end with "
                        "concurrent clients and print qps/latency stats")
    p.add_argument("--stream_clients", type=int, default=8)
    p.add_argument("--stream_wait_ms", type=float, default=5.0)
    p.add_argument("--mesh_devices", type=int, default=0,
                   help="fit + serve row-sharded over an n-device mesh "
                        "(0 = single chip); any n_train works (inert-row "
                        "padding). With --nystrom_m, shards the moment "
                        "panels instead")
    p.add_argument("--nystrom_m", type=int, default=None,
                   help="serve from the streaming Nystrom/DTC tier with "
                        "this many inducing rows (O(m^2) device state at "
                        "any train-set size)")
    p.add_argument("--nystrom_moments", type=str, default=None,
                   choices=("fp32", "df64"),
                   help="Nystrom moment-streaming precision (df64 = "
                        "emulated-fp64 kernels/projection/accumulators; "
                        "tails ride through --ckpt round-trips)")
    p.add_argument("--pad_slots", type=int, default=None,
                   help="single-chip exact tier: reserve this many inert "
                        "rows so online feedback extends are bucketed "
                        "IN-PLACE appends (no fresh-shape compile "
                        "mid-traffic; size to the expected feedback "
                        "volume between refits)")
    p.add_argument("--learn_hyper", action="store_true",
                   help="learn (w0, w, b, diag_reg) by evidence before "
                        "fitting — against the DTC tier's own evidence "
                        "when --nystrom_m is set (gp/hyperopt.py); the "
                        "learned spec rides through --ckpt")
    # three-state flags (unset / --x / --no-x): --quality best fills only
    # UNSET ones, so the explicit-off form must stay expressible
    p.add_argument("--ard", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="with --learn_hyper: learn a per-feature input "
                        "scale (recommended: ARD x DTC beats the default "
                        "kernel on 90k Nystrom serving, BASELINE.md). "
                        "Needs fp32-safe features: add --chunk_norm. "
                        "--no-ard forces it off under --quality best")
    p.add_argument("--chunk_norm", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="rescale packed categorical chunk slots onto the "
                        "[0,1000] numeric scale; --no-chunk_norm forces "
                        "the bit-exact reference encoding even under "
                        "--quality best")
    p.add_argument("--hyper_file", type=str, default=None,
                   help="learned-hyperparameter JSON artifact "
                        "(gp.hyperopt.HyperoptResult): if it exists, serve "
                        "with it and skip learning; with --learn_hyper and "
                        "no such file, learn then save it there")
    p.add_argument("--hyper_steps", type=int, default=100)
    p.add_argument("--hyper_points", type=int, default=4096,
                   help="hyperopt subsample; 0 = full train set (DTC "
                        "objective only)")
    p.add_argument("--calibrate_file", type=str, default=None,
                   help="HELD-OUT labeled query file (query@...@card lines, "
                        "e.g. the feedback log): fit the MLE std "
                        "recalibration + split-conformal score set before "
                        "serving (Estimator.calibrate_uncertainty); also "
                        "prints a conformal interval demo")
    p.add_argument("--interval_alpha", type=float, default=0.1,
                   help="with --calibrate_file: miscoverage level of the "
                        "demo conformal intervals (>= 1-alpha coverage)")
    p.add_argument("--feedback_mode", type=str, default="off",
                   choices=("off", "monitor", "online", "auto"),
                   help="with --listen: accept LABELED lines "
                        "(query@...@card) over the socket as serving "
                        "feedback — monitor drift, learn online, or "
                        "auto-remediate (serve/socket_server.py)")
    p.add_argument("--warmup_batch", type=int, default=4096,
                   help="with --listen: pre-compile every power-of-two "
                        "serving bucket up to this size before accepting "
                        "connections (0 disables); first-request compiles "
                        "cost seconds-to-minutes on a remote TPU")
    p.add_argument("--quality", type=str, default="reference",
                   choices=["reference", "best"],
                   help="'best' routes the measured-best decision table "
                        "(BASELINE.md) for every flag left unset: "
                        "chunk_norm, ARD evidence-learned hypers (auto "
                        "DTC objective with --nystrom_m), df64 Nystrom "
                        "moments, and a 10%% calibration holdout. "
                        "Explicit flags still win")
    p.add_argument("--tier", type=str, default=None,
                   choices=["auto", "exact", "nystrom", "distributed"],
                   help="posterior-tier routing: 'auto' picks by the "
                        "measured capability ladder (exact while the train "
                        "set fits one chip, distributed with "
                        "--mesh_devices, streaming Nystrom beyond); "
                        "explicit values force a tier. Default: derive "
                        "from --nystrom_m/--mesh_devices as before")
    p.add_argument("--calibrate_frac", type=float, default=None,
                   help="hold out this fraction of the training queries "
                        "and auto-calibrate uncertainty on them (std "
                        "temperature + conformal scores); an alternative "
                        "to --calibrate_file when no separate held-out "
                        "file exists")
    p.add_argument("--listen_max_requests", type=int, default=None,
                   help="with --listen: stop after serving this many "
                        "requests (soak tests / CI; default: forever)")
    p.add_argument("--listen", type=str, default=None, metavar="HOST:PORT",
                   help="after loading, serve forever over TCP: one "
                        "card-less query line in, one JSON estimate out "
                        "(serve/socket_server.py; requests from all "
                        "connections batch into shared device dispatches). "
                        "With --calibrate_file, responses carry conformal "
                        "lo/hi at --interval_alpha")
    return p


def main(argv=None):
    p = build_parser()
    args = p.parse_args(argv)
    if not args.test_query_file and not args.listen:
        p.error("--test_query_file is required unless --listen is given")

    from nngp_tpu.serve import Estimator
    import os
    mesh = None
    if args.mesh_devices:
        from nngp_tpu.parallel import make_mesh
        mesh = make_mesh(args.mesh_devices)
    if args.ckpt and os.path.exists(os.path.join(args.ckpt, "meta.json")):
        print("restoring from checkpoint ...")
        est = Estimator.restore(args.ckpt, mesh=mesh)
    else:
        print("loading schema and training data ... This may take seconds ...")
        learn_hyper = args.learn_hyper
        if args.hyper_file and os.path.exists(args.hyper_file):
            from nngp_tpu.gp.hyperopt import HyperoptResult
            learn_hyper = HyperoptResult.load(args.hyper_file)
            print(f"serving with hyperparameters from {args.hyper_file}")
        est = Estimator(args.schema_name, args.data_path,
                        args.train_query_path, chunk_size=args.chunk_size,
                        use_aux=args.use_aux,
                        q_error_threshold=args.q_error_threshold,
                        coef_var_threshold=args.coef_var_threshold,
                        stats_dir=args.stats_dir, mesh=mesh,
                        nystrom_m=args.nystrom_m,
                        # BooleanOptionalAction defaults: None when NOT
                        # given so --quality best can fill them; explicit
                        # --x / --no-x always wins
                        nystrom_moments=args.nystrom_moments,
                        chunk_norm=args.chunk_norm,
                        learn_hyper=learn_hyper,
                        hyper_ard=args.ard,
                        hyper_steps=args.hyper_steps,
                        hyper_points=args.hyper_points,
                        pad_slots=args.pad_slots,
                        quality=args.quality,
                        calibrate_frac=args.calibrate_frac,
                        tier=args.tier)
        if (args.hyper_file and est.hyper_result is not None
                and not os.path.exists(args.hyper_file)):
            est.hyper_result.save(args.hyper_file)
            print(f"saved hyperparameter artifact to {args.hyper_file}")
        if args.ckpt:
            est.save(args.ckpt)
    est.load_model()

    if args.calibrate_file:
        with open(args.calibrate_file) as f:
            cal_lines = [l.strip() for l in f if l.strip()]
        scale = est.calibrate_uncertainty(cal_lines)
        if args.ckpt:
            est.save(args.ckpt)     # calibration artifacts ride the ckpt

    if args.listen:
        from nngp_tpu.serve import EstimatorSocketServer
        host, _, port = args.listen.rpartition(":")
        alpha = args.interval_alpha if args.calibrate_file else None
        if args.warmup_batch:
            # pay every bucket's compile + cold-transfer cost BEFORE the
            # first client connects, not mid-traffic (Estimator.warmup)
            print(f"warming serving buckets up to {args.warmup_batch} ...",
                  flush=True)
            est.warmup(max_batch=args.warmup_batch)
        with EstimatorSocketServer(est, host=host or "127.0.0.1",
                                   port=int(port), alpha=alpha,
                                   feedback_mode=args.feedback_mode,
                                   # Nystrom auto-growth refits on the
                                   # training log; hand the server the
                                   # query dir so 'auto' is never inert
                                   train_log=args.train_query_path) as srv:
            print(f"serving on {srv.host}:{srv.port} "
                  f"(newline-delimited queries; JSON replies"
                  f"{'; conformal intervals' if alpha else ''}) — Ctrl-C "
                  "to stop", flush=True)
            try:
                last_report = time.monotonic()
                while True:
                    time.sleep(0.5)
                    st = srv.stats()
                    if (args.listen_max_requests is not None
                            and st["requests"] >= args.listen_max_requests):
                        break
                    if st["requests"] and time.monotonic() - last_report > 60:
                        last_report = time.monotonic()
                        print(f"served {st['requests']} requests over "
                              f"{st['batches']} batches "
                              f"(p95 {st['p95_latency_ms']:.1f} ms)",
                              flush=True)
            except KeyboardInterrupt:
                pass
            st = srv.stats()
            print(f"shutting down: served {st['requests']} requests over "
                  f"{st['batches']} batches", flush=True)
        return

    lines = load_query_lines_without_card(args.test_query_file, args.limit)
    t0 = time.perf_counter()
    mean, std = est.predict(lines)
    dt = time.perf_counter() - t0
    print(f"predicted {len(lines)} queries in {dt:.4f}s "
          f"({len(lines)/dt:.1f} q/s)")
    print("pred_mean shape", mean.shape, "pred_std shape", std.shape)
    print("first 5 (log2-card mean, std):")
    for m, s in list(zip(mean, std))[:5]:
        print(f"  {m:.3f}  {s:.3f}   (card ~ {2**float(m):.1f})")

    if args.calibrate_file:
        a = args.interval_alpha
        im, lo, hi = est.predict_interval(lines, alpha=a)
        print(f"\nconformal {100*(1-a):.0f}% cardinality intervals "
              f"(first 5; std_scale={scale:.3f}):")
        for m, l_, h in list(zip(im, lo, hi))[:5]:
            print(f"  card ~ {2**float(m):.1f}  in "
                  f"[{2**float(l_):.1f}, {2**float(h):.1f}]")

    if args.streaming:
        import threading
        from nngp_tpu.serve import StreamingBatcher
        print(f"\nstreaming load: {args.stream_clients} concurrent clients, "
              f"coalescing window {args.stream_wait_ms} ms")
        with StreamingBatcher(est.predict,
                              max_wait_ms=args.stream_wait_ms) as server:
            results = {}

            def client(cid):
                ms, ss = server.predict(lines)
                results[cid] = (ms, ss)

            threads = [threading.Thread(target=client, args=(c,))
                       for c in range(args.stream_clients)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
            st = server.stats()
        total = args.stream_clients * len(lines)
        print(f"streamed {total} requests in {dt:.3f}s "
              f"({total/dt:.1f} q/s) over {st['batches']} device batches "
              f"(mean batch {st['mean_batch']:.0f})")
        print(f"latency p50 {st['p50_latency_ms']:.1f} ms  "
              f"p95 {st['p95_latency_ms']:.1f} ms")


if __name__ == "__main__":
    main(sys.argv[1:])
