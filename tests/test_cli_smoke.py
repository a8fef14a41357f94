"""CLI smoke tests: every entry point runs end-to-end on tiny budgets
(CPU; conftest forces the backend)."""

import os

import numpy as np
import pytest

WORKLOAD = os.path.join(os.path.dirname(__file__), os.pardir, "workloads")


def test_train_cli_single_table():
    from nngp_tpu.cli.train import main
    profile = main(["--query_path", os.path.join(WORKLOAD, "forest_data"),
                    "--max_num_train", "400", "--calibration"])
    assert profile["count"] == 3600
    assert np.isfinite(profile["median"])


def test_train_cli_multi_join():
    from nngp_tpu.cli.train import main
    profile = main(["--schema_name", "synth",
                    "--query_path", os.path.join(WORKLOAD, "synth_join_data"),
                    "--max_num_train", "300"])
    assert profile["count"] == 480


def test_active_train_cli():
    from nngp_tpu.cli.active_train import main
    history = main(["--query_path", os.path.join(WORKLOAD, "forest_data"),
                    "--budget", "50", "--active_iters", "1"])
    assert len(history) == 1 and history[0]["num_train"] == 3650


def test_active_train_cli_multi_join():
    """The reference's active loop is schema-driven
    (/root/reference/active/active_train.py:21-27): the CLI supports the
    multi-join workload path (+ chunk_norm) like the train CLI does."""
    from nngp_tpu.cli.active_train import main
    history = main(["--schema_name", "synth",
                    "--query_path", os.path.join(WORKLOAD, "synth_join_data"),
                    "--chunk_norm", "--budget", "20", "--active_iters", "1"])
    assert len(history) == 1 and np.isfinite(history[0]["val_mse"])


def test_sweep_cli_single_config():
    from nngp_tpu.cli.sweep import main
    rows = main(["--query_path", os.path.join(WORKLOAD, "forest_data"),
                 "--depths", "1", "--activations", "relu",
                 "--kernel_types", "nngp", "--max_num_train", "300"])
    assert len(rows) == 1 and np.isfinite(rows[0]["median_q"])


def test_train_baselines_cli_krr():
    from nngp_tpu.cli.train_baselines import main
    main(["--model_type", "KRR",
          "--query_path", os.path.join(WORKLOAD, "forest_data"),
          "--max_num_train", "300"])


def test_sample_queries_cli_requires_exactly_one_mode(tmp_path):
    from nngp_tpu.cli.sample_queries import main
    with pytest.raises(SystemExit):
        main(["--data_path", str(tmp_path)])  # neither mode


def test_serve_demo_cli_mesh(tmp_path, capsys):
    from nngp_tpu.cli.serve_demo import main
    main(["--schema_name", "synth",
          "--stats_dir", os.path.join(WORKLOAD, "synth_stats"),
          "--train_query_path", os.path.join(WORKLOAD, "synth_join_data"),
          "--test_query_file",
          os.path.join(WORKLOAD, "synth_join_data", "join_query_2.txt"),
          "--limit", "16", "--mesh_devices", "8",
          "--ckpt", str(tmp_path / "ckpt")])
    out = capsys.readouterr().out
    assert "pred_mean shape" in out
    # restore path (second run hits the checkpoint, still over the mesh)
    main(["--schema_name", "synth",
          "--stats_dir", os.path.join(WORKLOAD, "synth_stats"),
          "--train_query_path", os.path.join(WORKLOAD, "synth_join_data"),
          "--test_query_file",
          os.path.join(WORKLOAD, "synth_join_data", "join_query_2.txt"),
          "--limit", "16", "--mesh_devices", "8",
          "--ckpt", str(tmp_path / "ckpt")])
    assert "restoring from checkpoint" in capsys.readouterr().out


def test_serve_demo_cli_learn_hyper_nystrom(tmp_path, capsys):
    """Serving CLI wires the recommended configuration: chunk_norm + ARD
    learn_hyper (auto-DTC objective via nystrom_m) + Nystrom tier, and the
    learned spec + feature scale ride through the checkpoint."""
    from nngp_tpu.cli.serve_demo import main
    argv = ["--schema_name", "synth",
            "--stats_dir", os.path.join(WORKLOAD, "synth_stats"),
            "--train_query_path", os.path.join(WORKLOAD, "synth_join_data"),
            "--test_query_file",
            os.path.join(WORKLOAD, "synth_join_data", "join_query_2.txt"),
            "--limit", "8", "--nystrom_m", "32", "--chunk_norm",
            "--learn_hyper", "--ard", "--hyper_steps", "5",
            "--hyper_points", "64", "--ckpt", str(tmp_path / "ck")]
    main(argv)
    out = capsys.readouterr().out
    assert "pred_mean shape" in out
    main(argv)
    assert "restoring from checkpoint" in capsys.readouterr().out


def test_serve_demo_cli_calibrate(capsys):
    from nngp_tpu.cli.serve_demo import main
    main(["--schema_name", "synth",
          "--stats_dir", os.path.join(WORKLOAD, "synth_stats"),
          "--train_query_path", os.path.join(WORKLOAD, "synth_join_data"),
          "--test_query_file",
          os.path.join(WORKLOAD, "synth_join_data", "join_query_2.txt"),
          "--limit", "16", "--calibrate_file",
          os.path.join(WORKLOAD, "synth_join_data", "join_query_3.txt")])
    out = capsys.readouterr().out
    assert "calibrated on" in out and "conformal 90% cardinality" in out


def test_serve_demo_cli_quality_best(tmp_path, capsys):
    """--quality best routes the measured-best bundle (chunk_norm + ARD
    hypers + calibration holdout) without any individual flags."""
    from nngp_tpu.cli.serve_demo import main
    main(["--schema_name", "synth",
          "--stats_dir", os.path.join(WORKLOAD, "synth_stats"),
          "--train_query_path", os.path.join(WORKLOAD, "synth_join_data"),
          "--test_query_file",
          os.path.join(WORKLOAD, "synth_join_data", "join_query_2.txt"),
          "--limit", "8", "--quality", "best",
          "--hyper_steps", "5", "--hyper_points", "64",
          "--ckpt", str(tmp_path / "ckq")])
    out = capsys.readouterr().out
    assert "calibrated on" in out       # the holdout calibration really ran
    assert "pred_mean shape" in out


def test_train_cli_rbf_gp():
    from nngp_tpu.cli.train import main
    profile = main(["--query_path", os.path.join(WORKLOAD, "forest_data"),
                    "--max_num_train", "200", "--kernel_type", "gp"])
    assert np.isfinite(profile["median"])


def test_train_cli_config_file(tmp_path):
    """--config seeds defaults from a typed RunConfig JSON; explicit flags
    still override."""
    from nngp_tpu.utils.config import RunConfig, SplitConfig
    import dataclasses
    cfg = RunConfig(split=SplitConfig(max_num_train=300))
    path = tmp_path / "run.json"
    path.write_text(cfg.to_json())
    # roundtrip sanity
    assert RunConfig.from_json(cfg.to_json()) == cfg
    from nngp_tpu.cli.train import main
    profile = main(["--config", str(path),
                    "--query_path", os.path.join(WORKLOAD, "forest_data")])
    assert np.isfinite(profile["median"])


def test_active_train_cli_learn_hyper():
    from nngp_tpu.cli.active_train import main
    history = main(["--query_path", os.path.join(WORKLOAD, "forest_data"),
                    "--budget", "50", "--active_iters", "1",
                    "--learn_hyper", "--hyper_steps", "5",
                    "--hyper_points", "128"])
    assert len(history) == 1 and np.isfinite(history[0]["val_mse"])


def test_train_cli_learn_hyper_ard():
    """--learn_hyper --ard: per-feature scales learned and applied to the
    train/test features before the fit."""
    from nngp_tpu.cli.train import main
    profile = main(["--query_path", os.path.join(WORKLOAD, "forest_data"),
                    "--max_num_train", "200", "--learn_hyper", "--ard",
                    "--hyper_steps", "4", "--hyper_points", "64"])
    assert np.isfinite(profile["median"])


def test_train_cli_select_kernel(monkeypatch):
    from nngp_tpu.cli import train as train_cli
    from nngp_tpu.gp.hyperopt import select_kernel

    def tiny_select(x, y, **kw):
        kw.update(depths=(1,), activations=("relu",), steps=4,
                  max_points=64)
        return select_kernel(x, y, **kw)

    monkeypatch.setattr("nngp_tpu.gp.hyperopt.select_kernel", tiny_select)
    train_cli.main(["--query_path", os.path.join(WORKLOAD, "forest_data"),
                    "--max_num_train", "300", "--select_kernel"])


def test_train_cli_select_kernel_ard(monkeypatch):
    """--select_kernel honors --ard: the winning structure carries a
    feature_scale and the CLI applies it to train/test features."""
    from nngp_tpu.cli import train as train_cli
    from nngp_tpu.gp.hyperopt import select_kernel

    seen = {}

    def tiny_select(x, y, **kw):
        kw.update(depths=(1,), activations=("relu",), steps=4,
                  max_points=64)
        seen.update(kw)
        return select_kernel(x, y, **kw)

    monkeypatch.setattr("nngp_tpu.gp.hyperopt.select_kernel", tiny_select)
    profile = train_cli.main(
        ["--query_path", os.path.join(WORKLOAD, "forest_data"),
         "--max_num_train", "300", "--select_kernel", "--ard"])
    assert seen.get("ard") is True
    assert np.isfinite(profile["median"])


def test_serve_demo_cli_listen_tcp(capsys):
    """--listen serves the estimator over TCP (socket_server) and exits
    after --listen_max_requests; responses carry conformal bounds because
    --calibrate_file is given."""
    import json
    import socket
    import threading
    from nngp_tpu.cli.serve_demo import main

    q2 = os.path.join(WORKLOAD, "synth_join_data", "join_query_2.txt")
    with open(q2) as f:
        lines = [ln.strip().rsplit("@", 1)[0]
                 for ln in f if ln.strip()][:6]
    got = {}

    def client():
        # the server needs a moment to fit + bind; retry the connect
        import time as _t
        for _ in range(240):
            _t.sleep(0.25)
            try:
                sk = socket.create_connection(("127.0.0.1", 45167),
                                              timeout=30)
                break
            except OSError:
                continue
        else:
            raise AssertionError("server never came up")
        with sk:
            f = sk.makefile("rwb")
            f.write(("".join(ln + "\n" for ln in lines)).encode())
            f.flush()
            sk.shutdown(socket.SHUT_WR)
            got["resp"] = [json.loads(raw.decode()) for raw in f]

    t = threading.Thread(target=client)
    t.start()
    main(["--schema_name", "synth",
          "--stats_dir", os.path.join(WORKLOAD, "synth_stats"),
          "--train_query_path", os.path.join(WORKLOAD, "synth_join_data"),
          "--calibrate_file",
          os.path.join(WORKLOAD, "synth_join_data", "join_query_3.txt"),
          "--listen", "127.0.0.1:45167",
          "--listen_max_requests", str(len(lines))])
    t.join(timeout=120)
    assert len(got["resp"]) == len(lines)
    for r in got["resp"]:
        assert np.isfinite(r["mean"]) and r["std"] >= 0
        assert r["lo"] <= r["mean"] <= r["hi"]
    assert "shutting down" in capsys.readouterr().out


def test_train_cli_hyper_file_learn_then_reuse(tmp_path, capsys):
    from nngp_tpu.cli.train import main
    hf = str(tmp_path / "hyper.json")
    args = ["--query_path", os.path.join(WORKLOAD, "forest_data"),
            "--max_num_train", "200", "--learn_hyper", "--hyper_steps", "6",
            "--hyper_points", "64", "--hyper_file", hf]
    p1 = main(args)
    assert os.path.exists(hf)
    out1 = capsys.readouterr().out
    assert "saved hyperparameter artifact" in out1
    # second run loads the artifact instead of learning
    p2 = main(args)
    out2 = capsys.readouterr().out
    assert "loaded hyperparameters from" in out2
    assert "hyperparameter learning (MLL)" not in out2
    assert np.isclose(p2["median"], p1["median"])


def test_production_serving_demo_runs():
    """The examples/ lifecycle demo (fit -> restore -> warmup -> TCP serve
    -> calibrate -> conformal -> extend -> drift -> relearn) must keep
    running end-to-end — it is the documented operations story."""
    import subprocess
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=root, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(root, "examples",
                                      "production_serving_demo.py")],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "drift=True (remediation hint: relearn_hyperparams)" in out.stdout
    assert "done" in out.stdout
