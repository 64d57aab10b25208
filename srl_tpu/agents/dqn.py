"""DQN ("deepq") — dueling + prioritized-replay Q-learning, on-device.

Replaces stable-baselines DQN as wrapped by rl_baselines/rl_algorithm/deepq.py
with its defaults (deepq.py:101-112): lr 1e-4, buffer 1e3, exploration
fraction 0.1 to eps 0.01, train_freq 4, learning_starts 500, target update
500, gamma 0.99, prioritized replay (alpha 0.6), dueling heads.

The env-step / buffer-insert / TD-update cadence runs inside one jitted scan
chunk; the replay buffer lives in HBM as fixed arrays.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from srl_tpu.agents.base import BaseRLAgent
from srl_tpu.agents.buffers import ReplayBuffer
from srl_tpu.core.env import VecEnv
from srl_tpu.core.normalize import RunningNorm
from srl_tpu.models.policies import MlpTorso, NatureCnnTorso, ORTHO_GAIN


@dataclasses.dataclass
class DQNConfig:
    learning_rate: float = 1e-4
    buffer_size: int = 1000
    exploration_fraction: float = 0.1
    exploration_final_eps: float = 0.01
    train_freq: int = 4
    batch_size: int = 32
    learning_starts: int = 500
    target_network_update_freq: int = 500
    gamma: float = 0.99
    prioritized_replay: bool = True
    prioritized_replay_alpha: float = 0.6
    prioritized_replay_beta0: float = 0.4
    dueling: bool = True


class DuelingQNet(nn.Module):
    n_actions: int
    torso: str = "mlp"
    dueling: bool = True

    @nn.compact
    def __call__(self, x):
        t = MlpTorso() if self.torso == "mlp" else NatureCnnTorso()
        h = t(x)
        dense = lambda f, name: nn.Dense(
            f, kernel_init=nn.initializers.orthogonal(ORTHO_GAIN), name=name
        )
        if self.dueling:
            v = dense(1, "value")(h)
            a = dense(self.n_actions, "adv")(h)
            return v + a - jnp.mean(a, axis=-1, keepdims=True)
        return dense(self.n_actions, "q")(h)


@struct.dataclass
class DQNState:
    params: dict
    target_params: dict
    opt_state: optax.OptState
    buffer: ReplayBuffer
    vstate: object
    obs: jax.Array
    obs_norm: Optional[RunningNorm]
    key: jax.Array
    global_step: jax.Array  # int32 env steps taken


class DQN(BaseRLAgent):
    name = "deepq"

    def __init__(self, env=None, num_envs: int = 4, policy: str = "auto",
                 config: DQNConfig = None, normalize_obs: Optional[bool] = None):
        super().__init__()
        self.env = env
        self.num_envs = num_envs
        self.config = config or DQNConfig()
        self.policy_kind = policy
        if env is not None:
            self.vec_env = VecEnv(env, num_envs)
            torso = "cnn" if (
                policy == "cnn"
                or (policy == "auto" and len(env.observation_space.shape) == 3)
            ) else "mlp"
            self.qnet = DuelingQNet(
                n_actions=env.action_space.n, torso=torso,
                dueling=self.config.dueling,
            )
            if normalize_obs is None:
                normalize_obs = env.srl_model != "raw_pixels"
            self.normalize_obs = normalize_obs
            self._tx = optax.adam(self.config.learning_rate)
            self._total_timesteps = 1

    def init_state(self, key, total_timesteps: int) -> DQNState:
        cfg = self.config
        key, k_env, k_params = jax.random.split(key, 3)
        vstate, obs = self.vec_env.reset(k_env)
        params = self.qnet.init(k_params, obs)
        obs_space = self.env.observation_space
        buffer = ReplayBuffer.create(
            cfg.buffer_size, obs_space.shape, obs_space.dtype, (), jnp.int32
        )
        self._total_timesteps = total_timesteps
        obs_norm = (
            RunningNorm.create(obs_space.shape) if self.normalize_obs else None
        )
        # target_params must be distinct buffers (donation-safe).
        target_params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        return DQNState(
            params=params, target_params=target_params,
            opt_state=self._tx.init(params),
            buffer=buffer, vstate=vstate, obs=obs, obs_norm=obs_norm,
            key=key, global_step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _epsilon(self, step):
        cfg = self.config
        frac = jnp.minimum(
            step.astype(jnp.float32)
            / jnp.maximum(cfg.exploration_fraction * self._total_timesteps, 1.0),
            1.0,
        )
        return 1.0 + frac * (cfg.exploration_final_eps - 1.0)

    def _beta(self, step):
        cfg = self.config
        frac = jnp.minimum(step.astype(jnp.float32) / self._total_timesteps, 1.0)
        return cfg.prioritized_replay_beta0 + frac * (1.0 - cfg.prioritized_replay_beta0)

    def _td_loss(self, params, target_params, batch, weights):
        cfg = self.config
        obs, actions, rewards, next_obs, dones = batch
        q = self.qnet.apply(params, obs)
        q_taken = jnp.take_along_axis(q, actions[:, None], axis=1)[:, 0]
        # Double DQN target (stable-baselines default double_q=True).
        next_q_online = self.qnet.apply(params, next_obs)
        next_actions = jnp.argmax(next_q_online, axis=1)
        next_q_target = self.qnet.apply(target_params, next_obs)
        next_q = jnp.take_along_axis(next_q_target, next_actions[:, None], axis=1)[:, 0]
        target = rewards + cfg.gamma * next_q * (1.0 - dones.astype(jnp.float32))
        td = q_taken - jax.lax.stop_gradient(target)
        loss = jnp.mean(weights * optax.huber_loss(td))
        return loss, td

    def train_chunk(self, state: DQNState, chunk: int):
        """`chunk` env steps with interleaved updates, one jit."""
        cfg = self.config

        def body(state, _):
            key, k_eps, k_act, k_sample = jax.random.split(state.key, 4)
            obs = state.obs
            if state.obs_norm is not None:
                obs_norm = state.obs_norm.update(state.obs)
                norm_obs = obs_norm.normalize(state.obs)
            else:
                obs_norm = state.obs_norm
                norm_obs = state.obs

            q = self.qnet.apply(state.params, norm_obs)
            greedy = jnp.argmax(q, axis=1)
            eps = self._epsilon(state.global_step)
            random_actions = jax.random.randint(
                k_eps, (self.num_envs,), 0, self.env.action_space.n
            )
            explore = jax.random.uniform(k_act, (self.num_envs,)) < eps
            actions = jnp.where(explore, random_actions, greedy).astype(jnp.int32)

            vstate, tr = self.vec_env.step(state.vstate, actions)
            next_norm_obs = (
                obs_norm.normalize(tr.obs) if obs_norm is not None else tr.obs
            )
            buffer = state.buffer.add_batch(
                norm_obs, actions, tr.reward, next_norm_obs, tr.done
            )

            global_step = state.global_step + self.num_envs

            def do_update(args):
                params, opt_state, buffer = args
                if cfg.prioritized_replay:
                    idx, batch, weights = buffer.sample_prioritized(
                        k_sample, cfg.batch_size, cfg.prioritized_replay_alpha,
                        self._beta(global_step),
                    )
                else:
                    idx, batch, weights = buffer.sample_uniform(
                        k_sample, cfg.batch_size
                    )
                (loss, td), grads = jax.value_and_grad(
                    self._td_loss, has_aux=True
                )(params, state.target_params, batch, weights)
                updates, opt_state = self._tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                buffer = buffer.update_priorities(idx, td)
                return params, opt_state, buffer

            should_train = (global_step >= cfg.learning_starts) & (
                (global_step // self.num_envs) % cfg.train_freq == 0
            )
            params, opt_state, buffer = jax.lax.cond(
                should_train, do_update, lambda a: a,
                (state.params, state.opt_state, buffer),
            )

            update_target = (
                global_step % cfg.target_network_update_freq
            ) < self.num_envs
            target_params = jax.tree.map(
                lambda t, p: jnp.where(update_target, p, t),
                state.target_params, params,
            )

            new_state = DQNState(
                params=params, target_params=target_params, opt_state=opt_state,
                buffer=buffer, vstate=vstate, obs=tr.obs, obs_norm=obs_norm,
                key=key, global_step=global_step,
            )
            return new_state, (tr.reward, tr.episode_return, tr.episode_length)

        return jax.lax.scan(body, state, None, length=chunk)

    # ------------------------------------------------------------------
    def learn(self, total_timesteps: int, seed: int = 0,
              callback: Optional[Callable] = None, chunk: int = 64) -> DQNState:
        state = self.init_state(jax.random.PRNGKey(seed), total_timesteps)
        jit_chunk = jax.jit(self.train_chunk, static_argnums=1, donate_argnums=0)
        episode_returns, episode_lengths = [], []
        t0 = time.time()
        steps = 0
        update = 0
        while steps < total_timesteps:
            state, (rewards, ep_ret, ep_len) = jit_chunk(state, chunk)
            self.state = state
            steps += chunk * self.num_envs
            update += 1
            er = np.asarray(ep_ret)
            fin = ~np.isnan(er)
            if fin.any():
                episode_returns.extend(er[fin].tolist())
                episode_lengths.extend(np.asarray(ep_len)[fin].tolist())
            if callback is not None:
                callback(
                    {"self": self, "state": state, "update": update,
                     "n_updates": max(total_timesteps // (chunk * self.num_envs), 1),
                     "num_timesteps": steps,
                     "episode_returns": episode_returns,
                     "episode_lengths": episode_lengths,
                     "metrics": {"mean_reward_per_step": float(np.asarray(rewards).mean())},
                     "fps": steps / max(time.time() - t0, 1e-9)},
                    {},
                )
        self.state = state
        return state

    # ---- BaseRLObject surface -------------------------------------------
    def customArguments(self, parser):
        super().customArguments(parser)
        parser.add_argument("--prioritized", type=int, default=1)
        parser.add_argument("--dueling", type=int, default=1)
        parser.add_argument("--buffer-size", type=int, default=int(1e3))
        return parser

    @classmethod
    def getOptParam(cls):
        return {
            "learning_rate": (float, (1e-2, 1e-5)),
            "exploration_fraction": (float, (0, 1)),
            "exploration_final_eps": (float, (0, 0.2)),
            "train_freq": (int, (1, 16)),
            "batch_size": (int, (16, 256)),
            "target_network_update_freq": (int, (50, 5000)),
            "gamma": (float, (0.5, 1)),
        }

    def getAction(self, observation, dones=None, deterministic=True, key=None):
        obs = jnp.asarray(observation)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        q = self.qnet.apply(self.state.params, obs)
        return np.asarray(jnp.argmax(q, axis=1))

    def getActionProba(self, observation, dones=None):
        obs = jnp.asarray(observation)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        q = self.qnet.apply(self.state.params, obs)
        return np.asarray(jax.nn.softmax(q, axis=-1))

    def save(self, save_path, _locals=None):
        self._save_pickle(
            save_path,
            {"name": self.name, "config": dataclasses.asdict(self.config),
             "num_envs": self.num_envs, "policy_kind": self.policy_kind,
             "normalize_obs": self.normalize_obs,
             "params": self._to_numpy(self.state.params),
             "obs_norm": (
                 self._to_numpy(
                     {"mean": self.state.obs_norm.mean,
                      "var": self.state.obs_norm.var,
                      "count": self.state.obs_norm.count})
                 if self.state.obs_norm is not None else None)},
        )

    @classmethod
    def load(cls, load_path, env=None, args=None):
        d = cls._load_pickle(load_path)
        agent = cls(env=env, num_envs=d["num_envs"], policy=d["policy_kind"],
                    config=DQNConfig(**d["config"]),
                    normalize_obs=d["normalize_obs"])
        params = jax.tree.map(jnp.asarray, d["params"])
        obs_norm = None
        if d["obs_norm"] is not None:
            obs_norm = RunningNorm(
                mean=jnp.asarray(d["obs_norm"]["mean"]),
                var=jnp.asarray(d["obs_norm"]["var"]),
                count=jnp.asarray(d["obs_norm"]["count"]),
            )
        agent.state = DQNState(
            params=params, target_params=params, opt_state=None, buffer=None,
            vstate=None, obs=None, obs_norm=obs_norm,
            key=jax.random.PRNGKey(0), global_step=jnp.int32(0),
        )
        return agent
