"""Main training entry point.

CLI parity with ``python -m rl_baselines.train`` (rl_baselines/train.py):
same flag surface, srl_models.yaml checkpoint resolution
(configureEnvAndLogFolder, train.py:69-108), the
``logs/{env}/{srl_model}/{algo}/{datetime}/`` log-dir schema (train.py:81-103),
args/env_globals config snapshots (train.py:282-315), the 1.1x timestep
inflation (train.py:319), and best-model checkpointing when the mean reward
over the last --episode-window episodes improves (callback, train.py:111-169).

Usage (README quickstart, README.md:36):
  python -m srl_tpu.experiments.train --algo ppo2 --env MobileRobotGymEnv-v0 \
      --srl-model ground_truth --num-timesteps 10000
"""
from __future__ import annotations

import argparse
import dataclasses
import inspect
import json
import os
import time
from datetime import datetime
from typing import Optional

import numpy as np
import yaml

from srl_tpu.agents.registry import registered_rl
from srl_tpu.agents import ActionType, AlgoType
from srl_tpu.envs.registry import registered_env
from srl_tpu.srl.registry import registered_srl
from srl_tpu.srl import SRLType
from srl_tpu.utils.logging import printGreen, printRed, printYellow
from srl_tpu.utils.monitor import MonitorWriter

LOG_INTERVAL = 10
LOG_DIR = ""
ALGO = None
ALGO_NAME = ""
ENV_NAME = ""
PLOT_TITLE = ""
EPISODE_WINDOW = 40  # train.py:36 (measure mean reward for the plot)
MIN_EPISODES_BEFORE_SAVE = 100  # train.py:38
N_EPISODES_EVAL = 100  # mean over last 100 episodes for best-model saving

params_saved = False
best_mean_reward = -10000


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Train script for RL algorithms (rl_baselines/train.py parity)"
    )
    parser.add_argument("--algo", default="ppo2", choices=list(registered_rl.keys()))
    parser.add_argument("--env", default="KukaButtonGymEnv-v0",
                        choices=list(registered_env.keys()))
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--episode_window", "--episode-window",
                        dest="episode_window", type=int, default=40,
                        help="Episode window for moving average plot")
    parser.add_argument("--port", type=int, default=8097,
                        help="(compat) visdom port — plots go to PNG here")
    parser.add_argument("--log-dir", default="logs/",
                        help="Directory for the experiment logs")
    parser.add_argument("--num-timesteps", type=int, default=int(1e6))
    parser.add_argument("--srl-model", type=str, default="raw_pixels",
                        choices=list(registered_srl.keys()))
    parser.add_argument("--num-stack", type=int, default=1,
                        help="Number of frames to stack")
    parser.add_argument("--render-scale", type=int, default=1,
                        choices=[1, 2, 4],
                        help="Coarse-trace factor for ray-traced pixel envs "
                        "(Kuka): 1 = exact 224x224 parity render (default), "
                        "2 = trace at 112 + upsample (~3.5x faster, >=90%% "
                        "of pixels within 8 of exact)")
    parser.add_argument("--coarse-obs", action="store_true", default=False,
                        help="With --render-scale 2: hand the traced "
                        "112x112 image to the CNN policy directly, folding "
                        "the 2x upsample into conv1 (exact same math, no "
                        "224x224 buffers anywhere — the fastest pixel "
                        "training config)")
    parser.add_argument("--action-repeat", type=int, default=1)
    parser.add_argument("--srl-config-file", type=str,
                        default="config/srl_models.yaml")
    parser.add_argument("--hyperparam", type=str, nargs="+", default=[])
    parser.add_argument("--min-episodes-save", type=int, default=100)
    parser.add_argument("--latest", action="store_true", default=False,
                        help="Use the latest trained SRL model for the env")
    parser.add_argument("--load-rl-model-path", type=str, default=None)
    parser.add_argument("--checkpoint-interval", type=int, default=0,
                        help="write a full-training-state checkpoint.pkl "
                        "every N updates (0 = off); enables --resume")
    parser.add_argument("--resume", type=str, default=None, metavar="LOG_DIR",
                        help="resume a crashed/interrupted run from its log "
                        "dir (restores args.json + checkpoint.pkl and "
                        "continues in place)")
    parser.add_argument("--profile", action="store_true", default=False,
                        help="Write a jax.profiler trace of the first "
                             "updates into the log dir")
    parser.add_argument("--updates-per-call", type=int, default=1,
                        help="Scan K PPO updates per jit call (fewer host "
                             "round-trips on TPU)")
    parser.add_argument("--recompute-obs", action="store_true", default=False,
                        help="Pixel PPO: store env states in the rollout "
                        "and re-render observations per minibatch instead "
                        "of keeping the [T*N, 224, 224, 3] slab in HBM "
                        "(bit-identical updates; 2-4x larger env batches "
                        "fit on a 16 GB chip)")
    parser.add_argument("--policy", type=str, default="auto",
                        choices=["auto", "mlp", "cnn", "lstm", "lnlstm",
                                 "cnnlstm", "cnnlnlstm"],
                        help="Network architecture (base_classes.py:227-246)")
    parser.add_argument("--shape-reward", action="store_true", default=False)
    parser.add_argument("-c", "--continuous-actions", action="store_true",
                        default=False)
    parser.add_argument("-joints", "--action-joints", action="store_true",
                        default=False)
    parser.add_argument("-r", "--random-target", action="store_true",
                        default=False)
    parser.add_argument("--no-vis", action="store_true", default=False,
                        help="Disable curve plotting (PNG)")
    parser.add_argument("--mixed-envs", type=str, nargs="+", default=None,
                        metavar="ENV_ID",
                        choices=list(registered_env.keys()),
                        help="Train ONE learner on a heterogeneous batch of "
                        "these env families (the pod configuration, e.g. "
                        "KukaButtonGymEnv-v0 OmnirobotEnv-v0); families "
                        "must share the observation space — raw_pixels at "
                        "a common shape or equal-dim SRL states. Overrides "
                        "--env for env construction; --env still names the "
                        "log-dir family.")
    # --num-envs is contributed by every algo via customArguments
    # (BaseRLAgent.customArguments, replacing the reference's --num-cpu).

    # First pass to discover the algo, then let it add custom arguments
    # (train.py:276-277 double-parse pattern).
    args, _ = parser.parse_known_args(argv)
    algo_class = registered_rl[args.algo][0]
    algo = algo_class()
    algo.customArguments(parser)
    args = parser.parse_args(argv)
    return args, parser


def configure_env_and_log_folder(args, env_kwargs: dict):
    """Resolve SRL checkpoint + build the log dir (train.py:69-108)."""
    path = args.srl_model
    srl_entry = registered_srl[args.srl_model]
    if srl_entry["type"] == SRLType.SRL:
        env_kwargs["use_srl"] = True
        if args.latest:
            printYellow("Using latest srl model")
            env_kwargs["srl_model_path"] = latest_srl_model(args)
        else:
            with open(args.srl_config_file) as f:
                all_models = yaml.safe_load(f)
            assert args.env in all_models, (
                f"Error: environment '{args.env}' not in srl config file "
                f"'{args.srl_config_file}'"
            )
            models = all_models[args.env]
            assert args.srl_model in models, (
                f"Error: srl_model '{args.srl_model}' not in config for env "
                f"{args.env}"
            )
            path = models[args.srl_model]
            env_kwargs["srl_model_path"] = os.path.join(
                models.get("log_folder", ""), path
            )

    if getattr(args, "resume", None):
        # Resuming reuses the original run's directory verbatim; creating a
        # fresh timestamped dir here would collide with the original run when
        # both land in the same wall-clock second (the reference instead
        # sleeps 1 s to dodge collisions, rl_baselines/train.py:104-106).
        log_dir = args.resume
    else:
        base = os.path.join(
            args.log_dir, args.env, args.srl_model, args.algo,
            datetime.now().strftime("%y-%m-%d_%Hh%M_%S"),
        )
        # Second-resolution timestamps collide when runs take <1 s (warm
        # jit caches make that routine here — pipeline grids hit it); the
        # reference sleeps a full second instead
        # (rl_baselines/train.py:104-106). Suffix until the mkdir is ours.
        log_dir, n = base, 1
        while True:
            try:
                os.makedirs(log_dir)
                break
            except FileExistsError:
                n += 1
                log_dir = f"{base}_{n}"
    return log_dir, env_kwargs


def latest_srl_model(args) -> str:
    """Most recently modified SRL checkpoint for this env
    (train.py:59-66 --latest resolution by mtime)."""
    import glob

    pattern = os.path.join("srl_logs", args.env, "**", "srl_model.pkl")
    candidates = glob.glob(pattern, recursive=True)
    assert candidates, f"No trained SRL models found under srl_logs/{args.env}"
    return max(candidates, key=os.path.getmtime)


def build_env(args, env_kwargs):
    from srl_tpu.envs import make_env

    def one_env(env_id):
        env_class = registered_env[env_id][0]
        sig = inspect.signature(env_class.__init__)
        accepted = set(sig.parameters)
        kwargs = {k: v for k, v in env_kwargs.items() if k in accepted}
        return make_env(env_id, **kwargs)

    srl_wrap = None
    if env_kwargs.get("use_srl"):
        from srl_tpu.srl.models import SRLEncodedEnv, loadSRLModel

        model = loadSRLModel(env_kwargs["srl_model_path"])
        srl_wrap = lambda e: SRLEncodedEnv(e, model)

    if getattr(args, "mixed_envs", None):
        # Pod configuration: heterogeneous families -> one learner batch
        # (core/mixed_env.py; BASELINE.json configs[4]). With a learned SRL
        # model each FAMILY is wrapped individually so the per-family VecEnvs
        # encode — wrapping the MixedEnv itself would let MixedVecEnv
        # vectorize the raw families and silently skip the encoder.
        from srl_tpu.core.mixed_env import MixedEnv

        families = [one_env(e) for e in args.mixed_envs]
        if srl_wrap is not None:
            families = [srl_wrap(f) for f in families]
        from srl_tpu.core.spaces import Discrete

        sizes = [f.action_space.n for f in families
                 if isinstance(f.action_space, Discrete)]
        if sizes and len(set(sizes)) > 1:
            printYellow(
                f"--mixed-envs families have differing action counts "
                f"{sizes}: shared actions beyond a family's range fold "
                f"back modulo its count (skews that family's action "
                f"distribution under exploration; construct MixedEnv with "
                f"explicit action_tables for task-specific semantics)"
            )
        env = MixedEnv(families, oob_action="modulo")
    else:
        env = one_env(args.env)
        if srl_wrap is not None:
            env = srl_wrap(env)

    if getattr(args, "num_stack", 1) > 1:
        from srl_tpu.core.frame_stack import FrameStack

        env = FrameStack(env, args.num_stack)
    return env


def make_callback(log_dir: str, args, monitor: MonitorWriter, algo,
                  resume_meta: dict = None):
    """Best-model saving + monitor CSV + metrics.jsonl (train.py:111-169),
    plus optional crash-resume checkpoints every --checkpoint-interval."""
    state = {"best": -1e4, "n_logged": 0, "n_steps": 0,
             "base_timesteps": 0, "base_episodes": 0}
    if resume_meta:
        state["best"] = resume_meta.get("best", state["best"])
        state["base_timesteps"] = resume_meta.get("num_timesteps", 0)
        state["base_episodes"] = resume_meta.get("n_episodes", 0)
    metrics_path = os.path.join(log_dir, "metrics.jsonl")
    save_interval = getattr(algo, "SAVE_INTERVAL", 1)
    log_interval = getattr(algo, "LOG_INTERVAL", 10)

    def callback(_locals, _globals):
        ep_returns = _locals["episode_returns"]
        ep_lengths = _locals["episode_lengths"]
        # Append new finished episodes to the monitor CSV.
        while state["n_logged"] < len(ep_returns):
            i = state["n_logged"]
            length = ep_lengths[i] if i < len(ep_lengths) else 0
            monitor.write_episode(ep_returns[i], length)
            state["n_logged"] += 1

        update = _locals["update"]
        if (update + 1) % save_interval == 0:
            if len(ep_returns) >= args.min_episodes_save:
                mean_reward = float(np.mean(ep_returns[-N_EPISODES_EVAL:]))
                if mean_reward > state["best"]:
                    state["best"] = mean_reward
                    printGreen(
                        f"Saving new best model: mean reward "
                        f"{mean_reward:.2f} over last {N_EPISODES_EVAL} episodes"
                    )
                    _locals["self"].save(
                        os.path.join(log_dir, f"{args.algo}_model.pkl"), _locals
                    )

        ckpt_interval = getattr(args, "checkpoint_interval", 0)
        if ckpt_interval and (update + 1) % ckpt_interval == 0:
            _locals["self"].save_checkpoint(
                os.path.join(log_dir, "checkpoint.pkl"),
                meta={
                    "num_timesteps": state["base_timesteps"]
                    + _locals["num_timesteps"],
                    "n_episodes": state["base_episodes"] + len(ep_returns),
                    "update": update,
                    "best": state["best"],
                },
            )

        if (update + 1) % log_interval == 0:
            window = ep_returns[-args.episode_window:]
            entry = {
                "update": update,
                "num_timesteps": state["base_timesteps"]
                + _locals["num_timesteps"],
                "n_episodes": state["base_episodes"] + len(ep_returns),
                "mean_reward": float(np.mean(window)) if window else None,
                "fps": _locals.get("fps"),
            }
            with open(metrics_path, "a") as f:
                f.write(json.dumps(entry) + "\n")
            printGreen(
                f"update {update + 1}/{_locals['n_updates']}  "
                f"steps {entry['num_timesteps']}  episodes {entry['n_episodes']}  "
                f"mean reward {entry['mean_reward'] if entry['mean_reward'] is not None else float('nan'):.2f}  "
                f"{entry['fps']:.0f} steps/s"
            )
            # Live learning curves: the reference refreshes its three visdom
            # windows every LOG_INTERVAL during training (train.py:162-167,
            # visualize.py:146-215); here the PNG + a tiny time throttle so
            # fast loops aren't dominated by matplotlib.
            if not getattr(args, "no_vis", False) and ep_returns:
                now = time.time()
                if now - state.get("last_plot", 0.0) > 2.0:
                    state["last_plot"] = now
                    monitor.flush()
                    try:
                        from srl_tpu.experiments.visualize import plot_log_dir

                        plot_log_dir(
                            log_dir,
                            title=f"{args.env} ({args.srl_model}, {args.algo})",
                            episode_window=args.episode_window,
                        )
                    except Exception:  # plotting must never kill training
                        pass

    return callback


def save_env_params(log_dir: str, env) -> None:
    """env_globals.json snapshot (train.py:49-56) — the typed-config
    equivalent of the reference's module-globals harvesting."""
    params = {}
    for k, v in vars(env).items():
        if isinstance(v, (int, float, bool, str, list, tuple)):
            params[k] = v
        elif isinstance(v, np.ndarray):
            params[k] = v.tolist()
    with open(os.path.join(log_dir, "env_globals.json"), "w") as f:
        json.dump(params, f, indent=2, default=str)


def main(argv=None):
    args, parser = parse_args(argv)

    # Crash resume: restore the run's own args (the reference can only
    # fine-tune from a policy pickle; this continues the exact run).
    resume_state, resume_meta = None, None
    if args.resume:
        with open(os.path.join(args.resume, "args.json")) as f:
            stored = json.load(f)
        for k, v in stored.items():
            if k not in ("resume", "checkpoint_interval") and hasattr(args, k):
                setattr(args, k, v)
        from srl_tpu.agents.base import BaseRLAgent

        resume_state, resume_meta = BaseRLAgent.load_checkpoint(
            os.path.join(args.resume, "checkpoint.pkl")
        )
        printYellow(
            f"Resuming {args.resume} from "
            f"{resume_meta.get('num_timesteps', 0)} steps"
        )

    algo_class, algo_type, action_types = registered_rl[args.algo]

    if args.continuous_actions:
        assert ActionType.CONTINUOUS in action_types, (
            f"Error: {args.algo} does not support continuous actions"
        )
    else:
        assert ActionType.DISCRETE in action_types or args.continuous_actions, (
            f"Error: {args.algo} does not support discrete actions"
        )

    env_kwargs = {
        "srl_model": args.srl_model,
        "shape_reward": args.shape_reward,
        "is_discrete": not args.continuous_actions,
        "action_joints": args.action_joints,
        "random_target": args.random_target,
        "action_repeat": args.action_repeat,
        "render_scale": args.render_scale,
        "coarse_obs": args.coarse_obs,
    }
    # SAC/DDPG are continuous-only: force it.
    if ActionType.DISCRETE not in action_types:
        env_kwargs["is_discrete"] = False

    log_dir, env_kwargs = configure_env_and_log_folder(args, env_kwargs)
    printGreen(f"Log dir: {log_dir}")

    # Config snapshots (train.py:282-283).
    with open(os.path.join(log_dir, "args.json"), "w") as f:
        json.dump(
            {k: v for k, v in vars(args).items()
             if isinstance(v, (int, float, str, bool, list, type(None)))},
            f, indent=2,
        )

    env = build_env(args, env_kwargs)
    save_env_params(log_dir, getattr(env, "_env", env))

    hyperparams = algo_class.parserHyperParam(args.hyperparam)

    num_envs = args.num_envs
    if num_envs is None:
        num_envs = 16

    # Recurrent policy variants route to the LSTM implementations
    # (the reference's policy selection, base_classes.py:227-246). The same
    # routing is used by replay/enjoy at load time.
    from srl_tpu.agents.registry import resolve_policy_class

    algo_class = resolve_policy_class(args.algo, args.policy)

    kwargs = {}
    sig = inspect.signature(algo_class.__init__)
    if "num_envs" in sig.parameters:
        kwargs["num_envs"] = num_envs
    if "policy" in sig.parameters and args.policy != "auto":
        kwargs["policy"] = args.policy
    if "recompute_obs" in sig.parameters and getattr(args, "recompute_obs", False):
        kwargs["recompute_obs"] = True
    if "config" in sig.parameters:
        # Algo config = defaults <- matching CLI flags (customArguments,
        # e.g. ddpg's --noise-action) <- 'k:v' hyperparam overrides
        # (the reference's parserHyperParam -> train_kwargs path).
        default = getattr(algo_class(), "config", None)
        if default is not None:
            cfg_kwargs = dataclasses.asdict(default)
            cli_overrides = {
                k: v for k, v in vars(args).items()
                if k in cfg_kwargs and v is not None
                and parser.get_default(k) != v
            }
            cfg_kwargs.update(cli_overrides)
            cfg_kwargs.update(hyperparams)
            if cli_overrides or hyperparams:
                kwargs["config"] = type(default)(**cfg_kwargs)

    agent = algo_class(env=env, **kwargs)

    # Fine-tune path: load pretrained weights, anneal lr (train.py:324-332).
    if args.load_rl_model_path is not None:
        printYellow(f"Fine-tuning from {args.load_rl_model_path}")
        loaded = algo_class.load(args.load_rl_model_path, env=env)
        agent.state = loaded.state

    monitor = MonitorWriter(log_dir, env_id=args.env,
                            append=args.resume is not None)
    callback = make_callback(log_dir, args, monitor, agent,
                             resume_meta=resume_meta)

    # 1.1x inflation so the last save interval fits (train.py:319).
    # Live curve server (the reference's visdom windows, train.py:162-167):
    # browse http://localhost:{args.port} while the run trains. A busy port
    # (parallel runs, pipelines) skips silently — vis never kills training.
    live_server = None
    if not args.no_vis:
        try:
            from srl_tpu.experiments.live_vis import LiveVisServer

            live_server = LiveVisServer(
                log_dir, port=args.port, window=args.episode_window
            )
            if live_server.start():
                printGreen(
                    f"Live curves: http://localhost:{args.port}"
                )
            else:
                live_server = None
        except Exception:
            live_server = None

    total = int(args.num_timesteps * 1.1)
    if resume_meta is not None:
        done = int(resume_meta.get("num_timesteps", 0))
        total = max(0, total - done)
        assert "initial_state" in inspect.signature(agent.learn).parameters, (
            f"--resume is not supported for algo '{args.algo}' yet"
        )
    t0 = time.time()
    learn_kwargs = {}
    if resume_state is not None:
        learn_kwargs["initial_state"] = resume_state
    if getattr(args, "updates_per_call", 1) > 1 and hasattr(agent, "learn"):
        import inspect as _inspect

        if "updates_per_call" in _inspect.signature(agent.learn).parameters:
            learn_kwargs["updates_per_call"] = args.updates_per_call
    if args.profile:
        # First-class profiling (SURVEY §5): a jax.profiler trace of the
        # training loop lands next to the logs.
        import jax

        with jax.profiler.trace(os.path.join(log_dir, "profile")):
            agent.learn(total, seed=args.seed, callback=callback, **learn_kwargs)
    else:
        agent.learn(total, seed=args.seed, callback=callback, **learn_kwargs)
    printGreen(f"Training done in {time.time() - t0:.1f}s")

    # Always leave a final model on disk even below the episode threshold.
    final_path = os.path.join(log_dir, f"{args.algo}_final_model.pkl")
    agent.save(final_path)
    monitor.close()
    if live_server is not None:
        live_server.stop()

    if not args.no_vis:
        try:
            from srl_tpu.experiments.visualize import plot_log_dir

            plot_log_dir(log_dir, title=f"{args.env} ({args.srl_model}, {args.algo})")
        except Exception as e:  # plotting must never kill a finished run
            printRed(f"Plotting failed: {e}")
    return log_dir


if __name__ == "__main__":
    main()
