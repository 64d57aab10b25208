"""Train CLI end-to-end tests (the reference's test_pipeline.py style, but
in-process instead of subprocess so the CPU test platform is shared)."""
import json
import os

import numpy as np
import pytest

from srl_tpu.experiments.train import main as train_main
from srl_tpu.utils.monitor import compute_mean_reward, load_results


@pytest.mark.fast
def test_train_cli_quickstart(tmp_path):
    """README quickstart config: ppo2 + MobileRobot ground_truth."""
    log_dir = train_main([
        "--algo", "ppo2", "--env", "MobileRobotGymEnv-v0",
        "--srl-model", "ground_truth", "--num-timesteps", "4000",
        "--log-dir", str(tmp_path), "--num-envs", "8",
        "--min-episodes-save", "5", "--no-vis", "--seed", "1",
    ])
    # Log-dir schema logs/{env}/{srl}/{algo}/{date} (train.py:81-103).
    parts = os.path.relpath(log_dir, str(tmp_path)).split(os.sep)
    assert parts[0] == "MobileRobotGymEnv-v0"
    assert parts[1] == "ground_truth"
    assert parts[2] == "ppo2"
    for f in ("args.json", "env_globals.json", "0.monitor.csv",
              "ppo2_final_model.pkl"):
        assert os.path.exists(os.path.join(log_dir, f)), f
    args = json.load(open(os.path.join(log_dir, "args.json")))
    assert args["seed"] == 1
    results = load_results(log_dir)
    assert len(results) == 1 and len(results[0]["r"]) > 0
    ok, mean_r = compute_mean_reward(log_dir, 100)
    assert ok and np.isfinite(mean_r)


@pytest.mark.fast
def test_live_training_curves(tmp_path, monkeypatch):
    """The learning-curve PNG must refresh DURING training every
    LOG_INTERVAL (reference updates its visdom windows live,
    train.py:162-167), not only at run end."""
    import srl_tpu.experiments.visualize as vis

    mtimes = []
    real_plot = vis.plot_log_dir

    def spy(*a, **kw):
        out = real_plot(*a, **kw)
        if out and os.path.exists(out):
            mtimes.append(os.path.getmtime(out))
        return out

    monkeypatch.setattr(vis, "plot_log_dir", spy)
    train_main([
        "--algo", "ppo2", "--env", "MobileRobot1DGymEnv-v0",
        "--srl-model", "ground_truth", "--num-timesteps", "6000",
        "--log-dir", str(tmp_path), "--num-envs", "8",
        "--min-episodes-save", "5", "--seed", "1",
        "--hyperparam", "n_steps:16",  # ~47 updates -> several LOG_INTERVALs
    ])
    # At least one refresh happened mid-training (callback) plus the final
    # one: two plot calls total or more.
    assert len(mtimes) >= 2, f"live plotting never ran during training: {mtimes}"


@pytest.mark.fast
@pytest.mark.parametrize("algo", ["a2c", "random_agent"])
def test_train_cli_other_algos(tmp_path, algo):
    log_dir = train_main([
        "--algo", algo, "--env", "MobileRobot1DGymEnv-v0",
        "--srl-model", "ground_truth", "--num-timesteps", "1500",
        "--log-dir", str(tmp_path), "--num-envs", "4", "--no-vis",
    ])
    assert os.path.exists(os.path.join(log_dir, "args.json"))


@pytest.mark.fast
def test_train_cli_continuous_sac(tmp_path):
    log_dir = train_main([
        "--algo", "sac", "--env", "MobileRobotGymEnv-v0",
        "--srl-model", "ground_truth", "-c", "--num-timesteps", "600",
        "--log-dir", str(tmp_path), "--num-envs", "2", "--no-vis",
    ])
    assert os.path.exists(os.path.join(log_dir, "sac_final_model.pkl"))


@pytest.mark.fast
def test_train_cli_hyperparam_override(tmp_path):
    log_dir = train_main([
        "--algo", "ppo2", "--env", "MobileRobotGymEnv-v0",
        "--srl-model", "ground_truth", "--num-timesteps", "2000",
        "--log-dir", str(tmp_path), "--num-envs", "4", "--no-vis",
        "--hyperparam", "gamma:0.9", "n_steps:16",
    ])
    assert os.path.exists(log_dir)


@pytest.mark.fast
def test_train_cli_rejects_bad_action_type(tmp_path):
    with pytest.raises(AssertionError):
        train_main([
            "--algo", "deepq", "--env", "MobileRobotGymEnv-v0",
            "--srl-model", "ground_truth", "-c",
            "--num-timesteps", "500", "--log-dir", str(tmp_path), "--no-vis",
        ])


def test_full_srl_rl_pipeline(tmp_path):
    """dataset gen -> SRL training -> yaml -> RL on encoded states
    (the reference's test_end_to_end.py flow)."""
    from srl_tpu.data.dataset_generator import generate_dataset
    from srl_tpu.experiments.train_srl import train_srl_model

    folder = generate_dataset(
        "MobileRobotGymEnv-v0", 3, save_path=str(tmp_path / "data"),
        name="mr", num_envs=2, max_steps=10,
    )
    train_srl_model(
        folder, "autoencoder", state_dim=3, epochs=1, batch_size=8,
        log_dir=str(tmp_path / "srl_logs" / "MobileRobotGymEnv-v0" / "autoencoder"),
    )
    yaml_path = str(tmp_path / "models.yaml")
    with open(yaml_path, "w") as f:
        f.write(
            "MobileRobotGymEnv-v0:\n"
            f"  log_folder: {tmp_path}/srl_logs/MobileRobotGymEnv-v0/\n"
            "  autoencoder: autoencoder/srl_model.pkl\n"
        )
    log_dir = train_main([
        "--algo", "ppo2", "--env", "MobileRobotGymEnv-v0",
        "--srl-model", "autoencoder", "--num-timesteps", "1000",
        "--log-dir", str(tmp_path / "logs"), "--num-envs", "2",
        "--srl-config-file", yaml_path, "--no-vis",
    ])
    assert "autoencoder" in log_dir


@pytest.mark.fast
def test_checkpoint_resume(tmp_path):
    """Crash-resume: a run writes full-training-state checkpoints; --resume
    restores args+state and continues the SAME run in place (beyond the
    reference, which can only fine-tune from a policy pickle)."""
    import json
    from srl_tpu.experiments.train import main

    log_dir = main([
        "--env", "MobileRobotGymEnv-v0", "--srl-model", "ground_truth",
        "--algo", "ppo2", "--num-timesteps", "2000", "--seed", "3",
        "--log-dir", str(tmp_path), "--num-envs", "4", "--no-vis",
        "--checkpoint-interval", "2",
    ])
    ckpt = os.path.join(log_dir, "checkpoint.pkl")
    assert os.path.exists(ckpt)
    from srl_tpu.agents.base import BaseRLAgent

    state, meta = BaseRLAgent.load_checkpoint(ckpt)
    steps_before = meta["num_timesteps"]
    assert steps_before > 0 and meta["update"] >= 1

    # Emulate a crash: the run's target was 8000 steps but it died after
    # the last checkpoint (edit the snapshot the way a bigger run would
    # have written it).
    args_path = os.path.join(log_dir, "args.json")
    with open(args_path) as f:
        stored = json.load(f)
    stored["num_timesteps"] = 8000
    with open(args_path, "w") as f:
        json.dump(stored, f)

    log_dir2 = main(["--resume", log_dir, "--checkpoint-interval", "2"])
    assert log_dir2 == log_dir
    _, meta2 = BaseRLAgent.load_checkpoint(ckpt)
    assert meta2["num_timesteps"] > steps_before
    # The resumed run kept training toward the original target in place.
    final = os.path.join(log_dir, "ppo2_final_model.pkl")
    assert os.path.exists(final)
