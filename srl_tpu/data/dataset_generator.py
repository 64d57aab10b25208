"""Dataset generation for SRL training.

CLI parity with ``python -m environments.dataset_generator``
(environments/dataset_generator.py:120-152), re-designed batched: instead of
N worker processes each stepping one env (:38-117), one jitted VecEnv rollout
steps all envs in lockstep and episodes are sliced out of the [T, N] batch —
part folders and post-hoc fusion (:203-263) are unnecessary.

Policies: random actions (default), a quickly-trained PPO2 (--run-ppo2,
:66-75), or the toward-target expert.

Usage:
  python -m srl_tpu.data.dataset_generator --env MobileRobotGymEnv-v0 \
      --num-episode 8 --save-path data/ --name mobile_robot_test
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import numpy as np

from srl_tpu.utils.logging import printGreen, printYellow


def generate_dataset(
    env_id: str,
    num_episodes: int,
    save_path: str = "data/",
    name: str = None,
    seed: int = 0,
    num_envs: int = 8,
    random_target: bool = False,
    shape_reward: bool = False,
    policy: str = "random",  # random | ppo2 | toward_target
    toward_target_proportion: float = 1.0,
    max_steps: Optional[int] = None,
    ppo2_timesteps: int = 20_000,
    env_kwargs: Optional[dict] = None,
):
    import jax
    import jax.numpy as jnp

    from srl_tpu.core.env import VecEnv
    from srl_tpu.envs import make_env
    from srl_tpu.srl.episode_saver import EpisodeSaver

    if name is None:
        name = env_id.split("-")[0].lower()
    kwargs = dict(
        srl_model="raw_pixels",
        random_target=random_target,
        shape_reward=shape_reward,
    )
    if max_steps is not None:
        kwargs["max_steps"] = max_steps
    kwargs.update(env_kwargs or {})
    env = make_env(env_id, **kwargs)

    agent = None
    if policy == "ppo2":
        # Train a quick PPO2 on ground truth to drive data collection
        # (dataset_generator.py:66-75 trains on the fly).
        from srl_tpu.agents.ppo import PPO2

        gt_env = make_env(env_id, **{**kwargs, "srl_model": "ground_truth"})
        agent = PPO2(env=gt_env, num_envs=num_envs)
        agent.learn(total_timesteps=ppo2_timesteps, seed=seed)

    vec = VecEnv(env, num_envs)
    key = jax.random.PRNGKey(np.random.RandomState(seed).randint(2**31))
    vstate, obs = vec.reset(key)

    n_act = getattr(env.action_space, "n", None)

    def pick_actions(key, vstate):
        """Jittable policy step (runs inside the chunked rollout scan)."""
        if policy == "toward_target" and hasattr(vstate.env_state, "robot_pos"):
            # Greedy axis move toward the target (discrete mobile robot).
            pos = vstate.env_state.robot_pos
            tgt = vstate.env_state.targets[:, 0]
            delta = tgt - pos
            ax = jnp.argmax(jnp.abs(delta), axis=-1)
            a = jnp.where(
                ax == 0,
                jnp.where(delta[:, 0] > 0, 1, 0),
                jnp.where(delta[:, 1] > 0, 3, 2),
            )
            a = a.astype(jnp.int32)
            if toward_target_proportion >= 1.0:
                return a
            # Per-step per-env mixing: each step uses the expert action with
            # probability --toward-target-timesteps-proportion, else a random
            # one — INSIDE the episode, matching the reference's per-step
            # coin flip (environments/dataset_generator.py:98-113,150), not
            # an all-or-nothing policy switch.
            k_rand, k_mix = jax.random.split(key)
            rand_a = jax.random.randint(k_rand, (num_envs,), 0, n_act)
            use_expert = jax.random.bernoulli(
                k_mix, toward_target_proportion, (num_envs,)
            )
            return jnp.where(use_expert, a, rand_a).astype(jnp.int32)
        if agent is not None:
            # Inline the trained policy (getAction is a host-level API; the
            # same normalize + sample runs on device inside the scan).
            gt_obs = jax.vmap(agent.env.observe)(vstate.env_state)
            if agent.state.obs_norm is not None:
                gt_obs = agent.state.obs_norm.normalize(gt_obs)
            dist, _ = agent.policy.apply(agent.state.params, gt_obs)
            a = dist.sample(key)
            return a.astype(jnp.int32) if n_act is not None else a
        if n_act is not None:
            return jax.random.randint(key, (num_envs,), 0, n_act)
        return jax.random.uniform(
            key, (num_envs,) + env.action_space.shape, minval=-1, maxval=1
        )

    saver = EpisodeSaver(
        name,
        max_dist=getattr(env, "max_distance", 0.0),
        state_dim=env.ground_truth_dim_() if hasattr(env, "ground_truth_dim_") else -1,
        globals_={"env_id": env_id, "seed": seed, **{k: str(v) for k, v in kwargs.items()}},
        path=save_path,
    )

    observe_gt = jax.jit(jax.vmap(env.ground_truth))
    observe_tgt = jax.jit(jax.vmap(env.target_pos))

    # Chunked rollout: CHUNK policy+env steps scanned inside ONE device
    # dispatch, transferred to the host as one [CHUNK, N, ...] block. The
    # per-step formulation paid a dispatch round-trip plus a ~1 MB pixel
    # transfer per step through the (tunneled) device link — the transfer
    # and dispatch latency, not the simulation, dominated generation.
    CHUNK = 32

    @jax.jit
    def rollout_chunk(vstate, key):
        def body(carry, _):
            vstate, key = carry
            key, sub = jax.random.split(key)
            actions = pick_actions(sub, vstate)
            vstate, tr = vec.step(vstate, actions)
            gt = jax.vmap(env.ground_truth)(vstate.env_state)
            tgt = jax.vmap(env.target_pos)(vstate.env_state)
            return (vstate, key), (tr.obs, actions, tr.reward, tr.done, gt,
                                   tgt)

        (vstate, key), outs = jax.lax.scan(
            body, (vstate, key), None, length=CHUNK
        )
        return vstate, key, outs

    # Record episodes from env slot 0..num_envs-1 round-robin until done.
    episodes_recorded = 0
    # Per-env episode buffers.
    buffers = [[] for _ in range(num_envs)]
    t_start = time.time()
    total_steps = 0

    gts = np.asarray(observe_gt(vstate.env_state))
    tgts = np.asarray(observe_tgt(vstate.env_state))
    for i in range(num_envs):
        buffers[i].append((np.asarray(obs[i]), None, 0.0, gts[i], tgts[i]))

    while episodes_recorded < num_episodes:
        vstate, key, outs = rollout_chunk(vstate, key)
        obs_np, act_np, rew_np, done_np, gts, tgts = (
            np.asarray(x) for x in outs
        )
        total_steps += CHUNK * num_envs
        for t in range(CHUNK):
            for i in range(num_envs):
                buffers[i].append(
                    (obs_np[t, i], act_np[t, i], float(rew_np[t, i]),
                     gts[t, i], tgts[t, i])
                )
                if done_np[t, i] and episodes_recorded < num_episodes:
                    # Flush episode i into the saver. The final obs belongs
                    # to the next episode (autoreset), so exclude it.
                    ep = buffers[i][:-1]
                    first_obs, _, _, gt0, tgt0 = ep[0]
                    saver.reset(first_obs, tgt0, gt0)
                    for obs_t, a_t, r_t, gt_t, _ in ep[1:]:
                        saver.step(obs_t, a_t, r_t, False, gt_t)
                    episodes_recorded += 1
                    buffers[i] = [buffers[i][-1]]
            if episodes_recorded >= num_episodes:
                break

    folder = saver.save()
    fps = total_steps / max(time.time() - t_start, 1e-9)
    printGreen(
        f"Saved {episodes_recorded} episodes ({len(saver.rewards)} frames) "
        f"to {folder} [{fps:.0f} FPS]"
    )
    return folder


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Batched dataset generator for SRL training"
    )
    parser.add_argument("--env", type=str, default="KukaButtonGymEnv-v0")
    parser.add_argument("--num-episode", type=int, default=50)
    parser.add_argument("--save-path", type=str, default="data/")
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num-cpu", "--num-envs", dest="num_envs", type=int, default=8)
    parser.add_argument("--random-target", action="store_true")
    parser.add_argument("--shape-reward", action="store_true")
    parser.add_argument("--run-ppo2", action="store_true")
    parser.add_argument("--toward-target-timesteps-proportion", type=float,
                        default=0.0,
                        help="Probability, per env per STEP, of taking the "
                        "expert toward-target action instead of a random "
                        "one (dataset_generator.py:98-113 semantics)")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--force", action="store_true")
    args = parser.parse_args(argv)

    name = args.name or args.env.split("-")[0].lower()
    out = os.path.join(args.save_path, name)
    if os.path.exists(out) and not args.force:
        raise ValueError(f"Folder {out} already exists (use --force)")

    policy = "ppo2" if args.run_ppo2 else (
        "toward_target" if args.toward_target_timesteps_proportion > 0 else "random"
    )
    generate_dataset(
        args.env,
        args.num_episode,
        save_path=args.save_path,
        name=args.name,
        seed=args.seed,
        num_envs=args.num_envs,
        random_target=args.random_target,
        shape_reward=args.shape_reward,
        policy=policy,
        toward_target_proportion=(
            args.toward_target_timesteps_proportion
            if args.toward_target_timesteps_proportion > 0 else 1.0
        ),
        max_steps=args.max_steps,
    )


if __name__ == "__main__":
    main()
