"""DDPG — deterministic policy gradient with action/parameter noise.

Replaces stable-baselines DDPG as wrapped by rl_baselines/rl_algorithm/ddpg.py
with the same defaults (ddpg.py:134-153): actor lr 1e-4, critic lr 1e-3 with
L2 1e-2 on critic weights, gamma 0.99, tau 0.001, batch 128; exploration via
OU or normal action noise (ddpg.py:104-121) and optional adaptive parameter
noise.
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
from srl_tpu.models.policies import MlpTorso, NatureCnnTorso


@dataclasses.dataclass
class DDPGConfig:
    actor_lr: float = 1e-4
    critic_lr: float = 1e-3
    critic_l2_reg: float = 1e-2
    buffer_size: int = 50_000
    batch_size: int = 128
    tau: float = 0.001
    gamma: float = 0.99
    learning_starts: int = 100
    noise_action: str = "ou"  # "ou" | "normal" | "none"
    noise_action_sigma: float = 0.2
    noise_param: bool = False
    noise_param_sigma: float = 0.2
    ou_theta: float = 0.15


class Actor(nn.Module):
    act_dim: int
    torso: str = "mlp"

    @nn.compact
    def __call__(self, x):
        t = MlpTorso((64, 64)) if self.torso == "mlp" else NatureCnnTorso()
        h = t(x)
        return jnp.tanh(nn.Dense(self.act_dim)(h))


class Critic(nn.Module):
    torso: str = "mlp"

    @nn.compact
    def __call__(self, obs, act):
        if self.torso == "mlp":
            h = MlpTorso((64, 64))(
                jnp.concatenate([obs.reshape(obs.shape[0], -1), act], axis=-1)
            )
        else:
            h = NatureCnnTorso()(obs)
            h = nn.relu(nn.Dense(64)(jnp.concatenate([h, act], axis=-1)))
        return nn.Dense(1)(h)[..., 0]


@struct.dataclass
class DDPGState:
    actor_params: dict
    critic_params: dict
    target_actor: dict
    target_critic: dict
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    buffer: ReplayBuffer
    vstate: object
    obs: jax.Array
    obs_norm: Optional[RunningNorm]
    ou_state: jax.Array  # [N, act_dim] Ornstein-Uhlenbeck noise state
    param_noise_sigma: jax.Array
    key: jax.Array
    global_step: jax.Array


class DDPG(BaseRLAgent):
    name = "ddpg"

    def __init__(self, env=None, num_envs: int = 4, policy: str = "auto",
                 config: DDPGConfig = None, normalize_obs: Optional[bool] = None):
        super().__init__()
        self.env = env
        self.num_envs = num_envs
        self.config = config or DDPGConfig()
        self.policy_kind = policy
        if env is not None:
            self.vec_env = VecEnv(env, num_envs)
            self.act_dim = int(np.prod(env.action_space.shape))
            torso = "cnn" if (
                policy == "cnn"
                or (policy == "auto" and len(env.observation_space.shape) == 3)
            ) else "mlp"
            self.actor = Actor(self.act_dim, torso)
            self.critic = Critic(torso)
            if normalize_obs is None:
                normalize_obs = env.srl_model != "raw_pixels"
            self.normalize_obs = normalize_obs
            self._actor_tx = optax.adam(self.config.actor_lr)
            self._critic_tx = optax.chain(
                optax.add_decayed_weights(self.config.critic_l2_reg),
                optax.adam(self.config.critic_lr),
            )

    def init_state(self, key) -> DDPGState:
        cfg = self.config
        key, k_env, k_a, k_c = jax.random.split(key, 4)
        vstate, obs = self.vec_env.reset(k_env)
        actor_params = self.actor.init(k_a, obs)
        critic_params = self.critic.init(
            k_c, obs, jnp.zeros((obs.shape[0], self.act_dim))
        )
        copy = lambda p: jax.tree.map(lambda x: jnp.array(x, copy=True), p)
        obs_space = self.env.observation_space
        buffer = ReplayBuffer.create(
            cfg.buffer_size, obs_space.shape, obs_space.dtype,
            (self.act_dim,), jnp.float32,
        )
        obs_norm = RunningNorm.create(obs_space.shape) if self.normalize_obs else None
        return DDPGState(
            actor_params=actor_params, critic_params=critic_params,
            target_actor=copy(actor_params), target_critic=copy(critic_params),
            actor_opt=self._actor_tx.init(actor_params),
            critic_opt=self._critic_tx.init(critic_params),
            buffer=buffer, vstate=vstate, obs=obs, obs_norm=obs_norm,
            ou_state=jnp.zeros((self.num_envs, self.act_dim)),
            param_noise_sigma=jnp.asarray(cfg.noise_param_sigma),
            key=key, global_step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def train_chunk(self, state: DDPGState, chunk: int):
        cfg = self.config

        def update(state, batch, key):
            obs, actions, rewards, next_obs, dones = batch
            next_act = self.actor.apply(state.target_actor, next_obs)
            target_q = rewards + cfg.gamma * (
                1 - dones.astype(jnp.float32)
            ) * self.critic.apply(state.target_critic, next_obs, next_act)
            target_q = jax.lax.stop_gradient(target_q)

            def critic_loss(cp):
                q = self.critic.apply(cp, obs, actions)
                return jnp.mean(jnp.square(q - target_q))

            _, cgrads = jax.value_and_grad(critic_loss)(state.critic_params)
            cupd, critic_opt = self._critic_tx.update(
                cgrads, state.critic_opt, state.critic_params
            )
            critic_params = optax.apply_updates(state.critic_params, cupd)

            def actor_loss(ap):
                act = self.actor.apply(ap, obs)
                return -jnp.mean(self.critic.apply(critic_params, obs, act))

            _, agrads = jax.value_and_grad(actor_loss)(state.actor_params)
            aupd, actor_opt = self._actor_tx.update(
                agrads, state.actor_opt, state.actor_params
            )
            actor_params = optax.apply_updates(state.actor_params, aupd)

            polyak = lambda t, p: jax.tree.map(
                lambda a, b: (1 - cfg.tau) * a + cfg.tau * b, t, p
            )
            return state.replace(
                actor_params=actor_params, critic_params=critic_params,
                target_actor=polyak(state.target_actor, actor_params),
                target_critic=polyak(state.target_critic, critic_params),
                actor_opt=actor_opt, critic_opt=critic_opt,
            )

        def body(state, _):
            key, k_noise, k_sample, k_upd, k_pn = jax.random.split(state.key, 5)
            if state.obs_norm is not None:
                obs_norm = state.obs_norm.update(state.obs)
                norm_obs = obs_norm.normalize(state.obs)
            else:
                obs_norm, norm_obs = state.obs_norm, state.obs

            if cfg.noise_param:
                # Adaptive parameter-space noise: perturb actor weights.
                leaves, treedef = jax.tree.flatten(state.actor_params)
                pkeys = jax.random.split(k_pn, len(leaves))
                noisy = [
                    l + jax.random.normal(k, l.shape) * state.param_noise_sigma
                    for l, k in zip(leaves, pkeys)
                ]
                act_params = jax.tree.unflatten(treedef, noisy)
            else:
                act_params = state.actor_params
            actions = self.actor.apply(act_params, norm_obs)

            ou_state = state.ou_state
            if cfg.noise_action == "ou":
                ou_state = (
                    ou_state - cfg.ou_theta * ou_state
                    + cfg.noise_action_sigma
                    * jax.random.normal(k_noise, ou_state.shape)
                )
                actions = actions + ou_state
            elif cfg.noise_action == "normal":
                actions = actions + cfg.noise_action_sigma * jax.random.normal(
                    k_noise, actions.shape
                )
            actions = jnp.clip(actions, -1.0, 1.0)

            vstate, tr = self.vec_env.step(state.vstate, actions)
            next_norm = (
                obs_norm.normalize(tr.obs) if obs_norm is not None else tr.obs
            )
            buffer = state.buffer.add_batch(
                norm_obs, actions, tr.reward, next_norm, tr.done
            )
            global_step = state.global_step + self.num_envs
            state = state.replace(
                buffer=buffer, vstate=vstate, obs=tr.obs, obs_norm=obs_norm,
                ou_state=ou_state, key=key, global_step=global_step,
            )

            def do_update(state):
                _, batch, _ = state.buffer.sample_uniform(k_sample, cfg.batch_size)
                return update(state, batch, k_upd)

            state = jax.lax.cond(
                global_step >= cfg.learning_starts, do_update, lambda s: s, state
            )
            return state, (tr.reward, tr.episode_return, tr.episode_length)

        return jax.lax.scan(body, state, None, length=chunk)

    # ------------------------------------------------------------------
    def learn(self, total_timesteps: int, seed: int = 0,
              callback: Optional[Callable] = None, chunk: int = 64) -> DDPGState:
        state = self.init_state(jax.random.PRNGKey(seed))
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
        # ddpg.py customArguments noise flags.
        parser.add_argument("--memory-limit", type=int, default=50000)
        parser.add_argument("--noise-action",
                            choices=["none", "normal", "ou"], default="ou")
        parser.add_argument("--noise-action-sigma", type=float, default=0.2)
        parser.add_argument("--noise-param", action="store_true", default=False)
        parser.add_argument("--noise-param-sigma", type=float, default=0.2)
        parser.add_argument("--batch-size", type=int, default=128)
        return parser

    @classmethod
    def getOptParam(cls):
        return {
            "actor_lr": (float, (1e-2, 1e-6)),
            "critic_lr": (float, (1e-2, 1e-6)),
            "batch_size": (int, (16, 512)),
            "gamma": (float, (0.5, 1)),
            "tau": (float, (0, 0.1)),
            "noise_action_sigma": (float, (0, 1)),
        }

    def getAction(self, observation, dones=None, deterministic=True, key=None):
        obs = jnp.asarray(observation)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        return np.asarray(self.actor.apply(self.state.actor_params, obs))

    def getActionProba(self, observation, dones=None):
        return self.getAction(observation)

    def save(self, save_path, _locals=None):
        self._save_pickle(
            save_path,
            {"name": self.name, "config": dataclasses.asdict(self.config),
             "num_envs": self.num_envs, "policy_kind": self.policy_kind,
             "normalize_obs": self.normalize_obs,
             "actor_params": self._to_numpy(self.state.actor_params),
             "critic_params": self._to_numpy(self.state.critic_params),
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
                    config=DDPGConfig(**d["config"]),
                    normalize_obs=d["normalize_obs"])
        obs_norm = None
        if d["obs_norm"] is not None:
            obs_norm = RunningNorm(
                mean=jnp.asarray(d["obs_norm"]["mean"]),
                var=jnp.asarray(d["obs_norm"]["var"]),
                count=jnp.asarray(d["obs_norm"]["count"]),
            )
        agent.state = DDPGState(
            actor_params=jax.tree.map(jnp.asarray, d["actor_params"]),
            critic_params=jax.tree.map(jnp.asarray, d["critic_params"]),
            target_actor=None, target_critic=None, actor_opt=None,
            critic_opt=None, buffer=None, vstate=None, obs=None,
            obs_norm=obs_norm, ou_state=None,
            param_noise_sigma=jnp.asarray(0.0),
            key=jax.random.PRNGKey(0), global_step=jnp.int32(0),
        )
        return agent
