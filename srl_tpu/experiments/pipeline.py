"""Benchmark pipeline: cross-product {srl_model x env x N seeds}.

Parity with ``python -m rl_baselines.pipeline`` (rl_baselines/pipeline.py):
validates the srl_models.yaml entries for every requested env
(pipeline.py:59-103), then runs the grid. The reference spawns a subprocess
per run (pipeline.py:119-134); here the runs execute in-process so each one
reuses the live TPU runtime and XLA compile cache — a failed run raises
ChildProcessError with the same semantics.
"""
from __future__ import annotations

import argparse
import os
import traceback

import yaml

from srl_tpu.envs.registry import registered_env
from srl_tpu.srl.registry import registered_srl
from srl_tpu.srl import SRLType
from srl_tpu.utils.logging import printGreen, printRed, printYellow


def validate_srl_models(srl_models: list, envs: list, config_file: str):
    """srl_models.yaml validation (pipeline.py:59-103)."""
    with open(config_file) as f:
        all_models = yaml.safe_load(f)
    for env in envs:
        assert env in registered_env, f"Error: unknown env {env}"
        for model in srl_models:
            assert model in registered_srl, f"Error: unknown srl model {model}"
            if registered_srl[model]["type"] == SRLType.SRL:
                assert env in all_models, (
                    f"Error: env {env} missing from {config_file}"
                )
                assert model in all_models[env], (
                    f"Error: srl model {model} not declared for env {env} "
                    f"in {config_file}"
                )
                path = os.path.join(
                    all_models[env].get("log_folder", ""), all_models[env][model]
                )
                if not os.path.exists(path):
                    printYellow(
                        f"Warning: checkpoint for {env}/{model} not found at "
                        f"{path} (train it first)"
                    )


def run_grid(
    envs, srl_models, algo="ppo2", num_timesteps=1_000_000, num_iteration=15,
    seed=0, log_dir="logs/", srl_config_file="config/srl_models.yaml",
    extra_args=None,
):
    from srl_tpu.experiments.train import main as train_main

    for env in envs:
        for model in srl_models:
            for it in range(num_iteration):
                run_seed = seed + it
                printGreen(
                    f"\n=== {env} | {model} | {algo} | seed {run_seed} ==="
                )
                argv = [
                    "--algo", algo, "--env", env, "--srl-model", model,
                    "--num-timesteps", str(num_timesteps),
                    "--seed", str(run_seed), "--log-dir", log_dir,
                    "--srl-config-file", srl_config_file, "--no-vis",
                ] + (extra_args or [])
                try:
                    train_main(argv)
                except Exception as e:
                    traceback.print_exc()
                    # pipeline.py:132-134 semantics.
                    raise ChildProcessError(
                        f"An error occurred for {env}/{model} seed {run_seed}: {e}"
                    )


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Pipeline script for benchmarking SRL models on RL tasks"
    )
    parser.add_argument("--algo", type=str, default="ppo2")
    parser.add_argument("--env", type=str, nargs="+",
                        default=["KukaButtonGymEnv-v0"])
    parser.add_argument("--srl-model", type=str, nargs="+",
                        default=["raw_pixels", "ground_truth"])
    parser.add_argument("--num-timesteps", type=int, default=int(1e6))
    parser.add_argument("--num-iteration", type=int, default=15,
                        help="Number of seeds per config (pipeline.py)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log-dir", type=str, default="logs/")
    parser.add_argument("--srl-config-file", type=str,
                        default="config/srl_models.yaml")
    args, extra = parser.parse_known_args(argv)

    validate_srl_models(args.srl_model, args.env, args.srl_config_file)
    run_grid(
        args.env, args.srl_model, args.algo, args.num_timesteps,
        args.num_iteration, args.seed, args.log_dir, args.srl_config_file,
        extra_args=extra,
    )


if __name__ == "__main__":
    main()
