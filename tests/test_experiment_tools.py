"""Replay/enjoy, plot aggregation, pipeline, hyperparam search tests."""
import csv
import glob
import os

import numpy as np
import pytest

from srl_tpu.experiments.train import main as train_main


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("logs"))
    log_dir = train_main([
        "--algo", "ppo2", "--env", "MobileRobotGymEnv-v0",
        "--srl-model", "ground_truth", "--num-timesteps", "4000",
        "--log-dir", base, "--num-envs", "8", "--no-vis",
        "--min-episodes-save", "5",
    ])
    return base, log_dir


def test_enjoy_replay(trained_run):
    from srl_tpu.replay.enjoy import enjoy

    base, log_dir = trained_run
    result = enjoy(log_dir, num_timesteps=600, num_envs=2, plot=True,
                   render=True)
    assert result["mean_return"] is not None
    assert os.path.exists(result["plot_path"])
    assert os.path.exists(result["frames_path"])


@pytest.mark.fast
def test_plots_and_aggregation(trained_run):
    from srl_tpu.experiments.visualize import plot_log_dir
    from srl_tpu.replay.aggregate_plots import main as agg_main
    from srl_tpu.replay.compare_plots import main as cmp_main
    from srl_tpu.replay.gather_results import main as gather_main

    base, log_dir = trained_run
    out = plot_log_dir(log_dir, episode_window=5)
    assert out and os.path.exists(out)

    env_dir = os.path.join(base, "MobileRobotGymEnv-v0")
    agg_main(["--log-dir", env_dir, "--episode-window", "5"])
    assert os.path.exists(os.path.join(env_dir, "ground_truth.npz"))
    assert os.path.exists(os.path.join(env_dir, "aggregated_curves.png"))

    cmp_main(["-i", env_dir])
    assert os.path.exists(os.path.join(env_dir, "comparison.png"))

    gather_main(["--log-dir", env_dir, "--timesteps", "2000", "4000",
                 "--episode-window", "5"])
    results_csv = os.path.join(env_dir, "results.csv")
    assert os.path.exists(results_csv)
    rows = list(csv.DictReader(open(results_csv)))
    assert rows[0]["method"] == "ground_truth"


@pytest.mark.fast
def test_pipeline_grid(tmp_path):
    from srl_tpu.experiments.pipeline import main as pipeline_main

    pipeline_main([
        "--algo", "ppo2", "--env", "MobileRobot1DGymEnv-v0",
        "--srl-model", "ground_truth", "--num-timesteps", "1000",
        "--num-iteration", "2", "--log-dir", str(tmp_path),
        "--num-envs", "4",
    ])
    runs = glob.glob(
        str(tmp_path / "MobileRobot1DGymEnv-v0" / "ground_truth" / "ppo2" / "*")
    )
    assert len(runs) == 2


@pytest.mark.fast
def test_pipeline_validates_yaml(tmp_path):
    from srl_tpu.experiments.pipeline import validate_srl_models

    yaml_path = str(tmp_path / "m.yaml")
    with open(yaml_path, "w") as f:
        f.write("MobileRobotGymEnv-v0:\n  log_folder: x/\n")
    with pytest.raises(AssertionError):
        validate_srl_models(["autoencoder"], ["MobileRobotGymEnv-v0"], yaml_path)
    # Env-provided models need no checkpoint.
    validate_srl_models(["ground_truth"], ["MobileRobotGymEnv-v0"], yaml_path)


@pytest.mark.slow
def test_hyperband_search(tmp_path):
    from srl_tpu.experiments.hyperparam_search import main as hp_main

    score, params = hp_main([
        "--algo", "ppo2", "--env", "MobileRobot1DGymEnv-v0",
        "--srl-model", "ground_truth", "--optimizer", "hyperband",
        "--max-eval", "3", "--num-timesteps", "500",
        "--log-dir", str(tmp_path / "hb"),
        "--output", str(tmp_path / "results.csv"),
    ])
    assert params is not None
    assert os.path.exists(str(tmp_path / "results.csv"))


@pytest.mark.fast
def test_tpe_suggest_shapes():
    from srl_tpu.experiments.hyperparam_search import TPE

    space = {"lr": (float, (1e-4, 1e-2)), "n": (int, (2, 8))}
    tpe = TPE(space, eval_fn=None, max_evals=5, seed=0)
    for i in range(10):
        p = tpe.suggest()
        assert 1e-4 <= p["lr"] <= 1e-2
        assert 2 <= p["n"] <= 8
        tpe.history.append((float(-i), p))


@pytest.mark.fast
def test_live_vis_server(tmp_path):
    """LiveVisServer serves the page and run data mid-run (the reference's
    live visdom windows, rl_baselines/visualize.py:146-215)."""
    import json
    import socket
    import urllib.request

    from srl_tpu.experiments.live_vis import LiveVisServer, read_run_data
    from srl_tpu.utils.monitor import MonitorWriter

    log_dir = str(tmp_path / "run")
    mon = MonitorWriter(log_dir, env_id="TestEnv-v0")
    for i in range(12):
        mon.write_episode(reward=float(i), length=10)
    mon.close()
    with open(os.path.join(log_dir, "metrics.jsonl"), "w") as f:
        f.write(json.dumps({"update": 9, "num_timesteps": 120,
                            "mean_reward": 5.5, "fps": 1000.0}) + "\n")

    data = read_run_data(log_dir, window=5)
    assert len(data["episodes"]) == 12
    assert data["episode_timesteps"][-1] == 120
    assert data["metrics_mean_reward"] == [5.5]

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    server = LiveVisServer(log_dir, port=port, window=5)
    assert server.start()
    try:
        page = urllib.request.urlopen(
            f"http://localhost:{port}/", timeout=5).read().decode()
        assert "srl_tpu live training" in page
        payload = json.loads(urllib.request.urlopen(
            f"http://localhost:{port}/data.json", timeout=5).read())
        assert payload["episodes"] == [float(i) for i in range(12)]
        assert payload["num_timesteps"] == 120
        # Busy port: a second server skips gracefully instead of raising.
        assert LiveVisServer(log_dir, port=port).start() is False
    finally:
        server.stop()
