"""Replay a trained agent (``python -m replay.enjoy_baselines`` parity).

Reconstructs the env from the run's ``args.json``/``env_globals.json``
(loadConfigAndSetup, replay/enjoy_baselines.py:66-118), loads the checkpoint,
rolls the policy out, and renders the artifacts the reference shows live —
action-probability bars and the (PCA-projected) latent/state trajectory
(:176-319) — to PNG files, plus an optional frame strip from the batched
renderer.

Usage:
  python -m srl_tpu.replay.enjoy --log-dir logs/MobileRobotGymEnv-v0/... \
      --num-timesteps 1000 [--render] [--plot]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Optional

import numpy as np

from srl_tpu.utils.logging import printGreen, printYellow


def latest_log_dir(base: str) -> str:
    """Most recent run directory under logs/env/srl/algo/ (--latest)."""
    candidates = [d for d in glob.glob(os.path.join(base, "*")) if os.path.isdir(d)]
    assert candidates, f"no runs under {base}"
    return max(candidates, key=os.path.getmtime)


def load_config_and_setup(log_dir: str):
    """(args_dict, env, agent) from a training run directory.

    Reconstructs the env EXACTLY as training built it — same ``build_env``
    code path, so ``--mixed-envs`` pods, learned-SRL wrapping (per family
    for mixed runs) and frame stacking all round-trip — and resolves the
    agent class from the stored (algo, policy) pair so a run trained with
    ``--policy lstm`` reloads as its Recurrent* class
    (enjoy_baselines.py:66-118 reconstructs the exact policy class)."""
    from types import SimpleNamespace

    from srl_tpu.agents.registry import resolve_policy_class
    from srl_tpu.experiments.train import build_env

    with open(os.path.join(log_dir, "args.json")) as f:
        train_args = json.load(f)

    env_kwargs = {
        "srl_model": train_args["srl_model"],
        "shape_reward": train_args.get("shape_reward", False),
        "is_discrete": not train_args.get("continuous_actions", False),
        "action_joints": train_args.get("action_joints", False),
        "random_target": train_args.get("random_target", False),
        "action_repeat": train_args.get("action_repeat", 1),
        "render_scale": train_args.get("render_scale", 1),
        "coarse_obs": train_args.get("coarse_obs", False),
    }

    # Learned SRL model: re-resolve the encoder checkpoint used at train time.
    from srl_tpu.srl.registry import registered_srl
    from srl_tpu.srl import SRLType

    if registered_srl[train_args["srl_model"]]["type"] == SRLType.SRL:
        import yaml

        with open(train_args["srl_config_file"]) as f:
            models = yaml.safe_load(f)[train_args["env"]]
        env_kwargs["use_srl"] = True
        env_kwargs["srl_model_path"] = os.path.join(
            models.get("log_folder", ""), models[train_args["srl_model"]]
        )

    ns = SimpleNamespace(
        env=train_args["env"],
        mixed_envs=train_args.get("mixed_envs"),
        num_stack=train_args.get("num_stack", 1),
    )
    env = build_env(ns, env_kwargs)

    algo_class = resolve_policy_class(
        train_args["algo"], train_args.get("policy", "auto")
    )
    model_path = os.path.join(log_dir, f"{train_args['algo']}_model.pkl")
    if not os.path.exists(model_path):
        model_path = os.path.join(log_dir, f"{train_args['algo']}_final_model.pkl")
        printYellow(f"Best model not found, using final model {model_path}")
    agent = algo_class.load(model_path, env=env)
    return train_args, env, agent


def enjoy(
    log_dir: str,
    num_timesteps: int = 1000,
    num_envs: int = 4,
    seed: int = 0,
    render: bool = False,
    plot: bool = False,
    deterministic: bool = True,
) -> dict:
    import jax
    import jax.numpy as jnp

    from srl_tpu.core.env import VecEnv
    from srl_tpu.core.spaces import Discrete

    train_args, env, agent = load_config_and_setup(log_dir)
    vec = VecEnv(env, num_envs)
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    vstate, obs = vec.reset(sub)
    step = jax.jit(vec.step)

    episode_returns = []
    states_traj = []
    probas = []
    frames = []
    n_steps = num_timesteps // num_envs
    # Episode-start mask threaded into getAction so recurrent policies reset
    # their LSTM state at episode boundaries (the reference feeds `dones`
    # into model.predict, enjoy_baselines.py:242-270).
    dones = np.zeros(num_envs, bool)
    for t in range(n_steps):
        key, sub = jax.random.split(key)
        actions = agent.getAction(
            np.asarray(obs), dones=dones, deterministic=deterministic, key=sub
        )
        vstate, tr = step(vstate, jnp.asarray(actions))
        obs = tr.obs
        dones = np.asarray(tr.done)
        er = np.asarray(tr.episode_return)
        episode_returns.extend(er[~np.isnan(er)].tolist())
        if plot:
            states_traj.append(np.asarray(obs[0]).reshape(-1))
            if isinstance(env.action_space, Discrete):
                probas.append(agent.getActionProba(np.asarray(obs[:1]))[0])
        if render and t % 10 == 0 and len(frames) < 16:
            base_env = getattr(env, "_env", env)
            if getattr(env, "is_mixed_family", False):
                # Mixed pods: render env 0 of family 0 (vstate is a tuple of
                # per-family VecEnvStates).
                base_env = env.families[0]
                base_env = getattr(base_env, "_env", base_env)
                env_state0 = vstate[0].env_state
            else:
                env_state0 = vstate.env_state
            try:
                img = np.asarray(
                    base_env.render_pixels(
                        jax.tree.map(lambda x: x[0], env_state0)
                    )
                )
                frames.append(img[..., :3])
            except (NotImplementedError, AttributeError):
                pass

    result = {
        "episode_returns": episode_returns,
        "mean_return": float(np.mean(episode_returns)) if episode_returns else None,
    }
    printGreen(
        f"Replayed {num_timesteps} steps: {len(episode_returns)} episodes, "
        f"mean return {result['mean_return']}"
    )

    if plot and states_traj:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        traj = np.stack(states_traj)
        if traj.shape[1] > 2:
            # PCA-project the latent trajectory (enjoy_baselines.py:176-298).
            traj = traj - traj.mean(0)
            _, _, vt = np.linalg.svd(traj, full_matrices=False)
            traj = traj @ vt[:2].T
        fig, axes = plt.subplots(1, 2 if probas else 1, figsize=(10, 4.5))
        ax0 = axes[0] if probas else axes
        ax0.plot(traj[:, 0], traj[:, 1] if traj.shape[1] > 1 else traj[:, 0],
                 ".-", ms=2, lw=0.5)
        ax0.set_title("state/latent trajectory (env 0)")
        if probas:
            mean_proba = np.mean(np.stack(probas), axis=0)
            axes[1].bar(np.arange(len(mean_proba)), mean_proba)
            axes[1].set_title("mean action probabilities")
        out = os.path.join(log_dir, "replay_plots.png")
        fig.tight_layout()
        fig.savefig(out, dpi=100)
        plt.close(fig)
        result["plot_path"] = out

    if frames:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = len(frames)
        fig, axes = plt.subplots(1, n, figsize=(2 * n, 2.2))
        for ax, fr in zip(np.atleast_1d(axes), frames):
            ax.imshow(fr)
            ax.axis("off")
        out = os.path.join(log_dir, "replay_frames.png")
        fig.savefig(out, dpi=80, bbox_inches="tight")
        plt.close(fig)
        result["frames_path"] = out
    return result


def main(argv=None):
    parser = argparse.ArgumentParser(description="Replay a trained agent")
    parser.add_argument("--log-dir", type=str, required=True,
                        help="Run directory (or parent with --latest)")
    parser.add_argument("--latest", action="store_true")
    parser.add_argument("--num-timesteps", type=int, default=1000)
    parser.add_argument("--num-envs", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--plot", action="store_true",
                        help="Save latent-trajectory/action-proba plots")
    parser.add_argument("--stochastic", action="store_true")
    args = parser.parse_args(argv)
    log_dir = latest_log_dir(args.log_dir) if args.latest else args.log_dir
    enjoy(log_dir, args.num_timesteps, args.num_envs, args.seed,
          render=args.render, plot=args.plot,
          deterministic=not args.stochastic)


if __name__ == "__main__":
    main()
