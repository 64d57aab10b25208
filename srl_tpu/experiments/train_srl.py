"""SRL encoder training CLI — the srl_zoo `train.py` capability.

Trains an encoder on a recorded dataset and writes an srl_models.yaml-ready
checkpoint directory (exp_config.json + srl_model.pkl).

Usage:
  python -m srl_tpu.experiments.train_srl --data-folder data/mobile_robot \
      --srl-model autoencoder --state-dim 3 --epochs 5 \
      --log-dir srl_logs/MobileRobotGymEnv-v0/autoencoder
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

from srl_tpu.srl.episode_saver import load_dataset
from srl_tpu.srl.registry import registered_srl
from srl_tpu.srl import SRLType
from srl_tpu.srl.trainer import SRLTrainer, fit_pca, save_pca
from srl_tpu.utils.logging import printGreen, printYellow


def train_srl_model(
    data_folder: str,
    srl_model: str,
    state_dim: int = 3,
    epochs: int = 10,
    batch_size: int = 64,
    learning_rate: float = 1e-3,
    seed: int = 0,
    log_dir: str = None,
    n_actions: int = None,
) -> str:
    entry = registered_srl[srl_model]
    assert entry["type"] == SRLType.SRL, (
        f"'{srl_model}' is an environment-provided mode, not a trainable model"
    )
    data = load_dataset(data_folder)
    if log_dir is None:
        log_dir = os.path.join("srl_logs", os.path.basename(data_folder), srl_model)

    if srl_model == "pca":
        pca = fit_pca(data["observations"], state_dim)
        path = save_pca(pca, log_dir)
        printGreen(f"PCA baseline saved to {path}")
        return path

    if n_actions is None:
        actions = np.asarray(data["actions"])
        n_actions = int(actions.max()) + 1 if actions.ndim == 1 else 4

    obs_shape = tuple(np.asarray(data["observations"]).shape[1:])
    trainer = SRLTrainer(
        state_dim=state_dim,
        losses=entry["losses"],
        image_obs=len(obs_shape) == 3,
        obs_shape=obs_shape,
        n_actions=n_actions,
        learning_rate=learning_rate,
        seed=seed,
        split_dimensions=entry.get("splits") or None,
    )
    if srl_model == "random":
        # Random frozen encoder: init only, no training.
        trainer.fit(data, epochs=0, batch_size=batch_size)
    else:
        t0 = time.perf_counter()
        out = trainer.fit(
            data, epochs=epochs, batch_size=batch_size,
            log_fn=lambda e, logs: printYellow(
                f"epoch {e}: " + " ".join(f"{k}={v:.4f}" for k, v in logs.items())
            ),
        )
        dt = time.perf_counter() - t0
        # Throughput printout (the reference logs FPS the same way,
        # random_agent.py:37-41); images_trained excludes pairs dropped by
        # epoch truncation, so this is the honest rate.
        printGreen(
            f"trained on {out['images_trained']} images in {dt:.1f}s "
            f"({out['images_trained'] / max(dt, 1e-9):.0f} img/s)"
        )
    path = trainer.save(log_dir)
    printGreen(f"SRL model '{srl_model}' saved to {path}")
    return path


def main(argv=None):
    parser = argparse.ArgumentParser(description="SRL encoder training")
    parser.add_argument("--data-folder", type=str, required=True)
    parser.add_argument("--srl-model", type=str, default="autoencoder",
                        choices=[n for n in registered_srl])
    parser.add_argument("--state-dim", type=int, default=3)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log-dir", type=str, default=None)
    args = parser.parse_args(argv)
    train_srl_model(
        args.data_folder, args.srl_model, args.state_dim, args.epochs,
        args.batch_size, args.learning_rate, args.seed, args.log_dir,
    )


if __name__ == "__main__":
    main()
