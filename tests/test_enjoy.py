"""Train-then-replay for every algorithm (the reference's tests/test_enjoy.py
coverage: fast tier for the core algos, slow for the rest)."""
import numpy as np
import pytest

from srl_tpu.experiments.train import main as train_main
from srl_tpu.replay.enjoy import enjoy, latest_log_dir

FAST_ALGOS = ["ppo2", "a2c", "deepq"]
SLOW_ALGOS = ["ppo1", "trpo", "acer", "acktr", "ars", "cma-es", "random_agent"]
CONTINUOUS_ALGOS = ["sac", "ddpg"]


def train_and_enjoy(algo, tmp_path, continuous=False, extra=None):
    argv = [
        "--algo", algo, "--env", "MobileRobot1DGymEnv-v0"
        if not continuous else "MobileRobotGymEnv-v0",
        "--srl-model", "ground_truth", "--num-timesteps", "1500",
        "--log-dir", str(tmp_path), "--num-envs", "4", "--no-vis",
    ] + (["-c"] if continuous else []) + (extra or [])
    log_dir = train_main(argv)
    result = enjoy(log_dir, num_timesteps=200, num_envs=2)
    assert result["mean_return"] is None or np.isfinite(result["mean_return"])


@pytest.mark.fast
@pytest.mark.parametrize("algo", FAST_ALGOS)
def test_enjoy_fast(algo, tmp_path):
    train_and_enjoy(algo, tmp_path)


@pytest.mark.slow
@pytest.mark.parametrize("algo", SLOW_ALGOS)
def test_enjoy_slow(algo, tmp_path):
    extra = None
    if algo == "acktr":
        extra = ["--hyperparam", "n_steps:8"]
    train_and_enjoy(algo, tmp_path, extra=extra)


@pytest.mark.slow
@pytest.mark.parametrize("algo", CONTINUOUS_ALGOS)
def test_enjoy_continuous(algo, tmp_path):
    train_and_enjoy(algo, tmp_path, continuous=True)


@pytest.mark.fast
def test_latest_log_dir_resolution(tmp_path):
    import os
    import time

    a = tmp_path / "run_a"
    b = tmp_path / "run_b"
    a.mkdir()
    time.sleep(0.05)
    b.mkdir()
    assert latest_log_dir(str(tmp_path)) == str(b)
