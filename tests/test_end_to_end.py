"""Full SRL -> RL pipeline across learned models (the reference's
tests/test_end_to_end.py flow): dataset generation, training several SRL
models into an srl_models_test.yaml-shaped tree, then RL on each."""
import os

import numpy as np
import pytest

SRL_MODELS = ["autoencoder", "supervised", "inverse", "forward",
              "robotic_priors", "vae", "pca"]


@pytest.mark.slow
def test_dataset_all_srl_models_then_rl(tmp_path):
    import jax

    from srl_tpu.data.dataset_generator import generate_dataset
    from srl_tpu.experiments.train import main as train_main
    from srl_tpu.experiments.train_srl import train_srl_model

    folder = generate_dataset(
        "MobileRobotGymEnv-v0", 6, save_path=str(tmp_path / "data"),
        name="mr", num_envs=4, max_steps=12,
    )

    log_root = tmp_path / "srl_logs_test" / "MobileRobotGymEnv-v0"
    yaml_lines = [
        "MobileRobotGymEnv-v0:",
        f"  log_folder: {log_root}{os.sep}",
    ]
    for model in SRL_MODELS:
        sub = "baselines/pca" if model == "pca" else model
        path = train_srl_model(
            folder, model, state_dim=3, epochs=1, batch_size=16,
            log_dir=str(log_root / sub),
        )
        rel = os.path.relpath(path, str(log_root))
        yaml_lines.append(f"  {model}: {rel}")
    yaml_path = str(tmp_path / "models.yaml")
    with open(yaml_path, "w") as f:
        f.write("\n".join(yaml_lines) + "\n")

    for model in SRL_MODELS:
        log_dir = train_main([
            "--algo", "ppo2", "--env", "MobileRobotGymEnv-v0",
            "--srl-model", model, "--num-timesteps", "500",
            "--log-dir", str(tmp_path / "logs"), "--num-envs", "2",
            "--srl-config-file", yaml_path, "--no-vis",
            "--hyperparam", "n_steps:8",
        ])
        assert model in log_dir
