"""SAC — soft actor-critic, on-device.

Replaces stable-baselines SAC as wrapped by rl_baselines/rl_algorithm/sac.py
(which passes library defaults, sac.py:93-98): squashed-Gaussian policy,
twin Q critics with Polyak targets, automatic entropy temperature toward
target entropy -dim(A). lr 3e-4, buffer 50k, batch 64, tau 0.005,
train_freq 1, learning_starts 100, gamma 0.99.
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

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


@dataclasses.dataclass
class SACConfig:
    learning_rate: float = 3e-4
    buffer_size: int = 50_000
    batch_size: int = 64
    tau: float = 0.005
    gamma: float = 0.99
    train_freq: int = 1
    learning_starts: int = 100
    ent_coef: str = "auto"  # or a float


class SquashedGaussianActor(nn.Module):
    act_dim: int
    torso: str = "mlp"

    @nn.compact
    def __call__(self, x):
        t = MlpTorso((256, 256)) if self.torso == "mlp" else NatureCnnTorso()
        h = t(x)
        mean = nn.Dense(self.act_dim)(h)
        log_std = jnp.clip(nn.Dense(self.act_dim)(h), LOG_STD_MIN, LOG_STD_MAX)
        return mean, log_std


class TwinQ(nn.Module):
    torso: str = "mlp"

    @nn.compact
    def __call__(self, obs, act):
        def q(name):
            t = (MlpTorso((256, 256)) if self.torso == "mlp"
                 else NatureCnnTorso())
            if self.torso == "mlp":
                h = t(jnp.concatenate(
                    [obs.reshape(obs.shape[0], -1), act], axis=-1))
            else:
                h = jnp.concatenate([t(obs), act], axis=-1)
                h = nn.relu(nn.Dense(256, name=name + "_fc")(h))
            return nn.Dense(1, name=name + "_out")(h)[..., 0]

        return q("q1"), q("q2")


def _sample_action(mean, log_std, key):
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape)
    pre_tanh = mean + std * eps
    action = jnp.tanh(pre_tanh)
    logp = jnp.sum(
        -0.5 * (jnp.square(eps) + 2 * log_std + jnp.log(2 * jnp.pi))
        - jnp.log(1 - jnp.square(action) + 1e-6),
        axis=-1,
    )
    return action, logp


@struct.dataclass
class SACState:
    actor_params: dict
    critic_params: dict
    target_critic_params: dict
    log_alpha: jax.Array
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    alpha_opt: optax.OptState
    buffer: ReplayBuffer
    vstate: object
    obs: jax.Array
    obs_norm: Optional[RunningNorm]
    key: jax.Array
    global_step: jax.Array


class SAC(BaseRLAgent):
    name = "sac"

    def __init__(self, env=None, num_envs: int = 4, policy: str = "auto",
                 config: SACConfig = None, normalize_obs: Optional[bool] = None):
        super().__init__()
        self.env = env
        self.num_envs = num_envs
        self.config = config or SACConfig()
        self.policy_kind = policy
        if env is not None:
            self.vec_env = VecEnv(env, num_envs)
            self.act_dim = int(np.prod(env.action_space.shape))
            torso = "cnn" if (
                policy == "cnn"
                or (policy == "auto" and len(env.observation_space.shape) == 3)
            ) else "mlp"
            self.actor = SquashedGaussianActor(self.act_dim, torso)
            self.critic = TwinQ(torso)
            if normalize_obs is None:
                normalize_obs = env.srl_model != "raw_pixels"
            self.normalize_obs = normalize_obs
            lr = self.config.learning_rate
            self._actor_tx = optax.adam(lr)
            self._critic_tx = optax.adam(lr)
            self._alpha_tx = optax.adam(lr)
            self.target_entropy = -float(self.act_dim)

    def init_state(self, key) -> SACState:
        cfg = self.config
        key, k_env, k_a, k_c = jax.random.split(key, 4)
        vstate, obs = self.vec_env.reset(k_env)
        actor_params = self.actor.init(k_a, obs)
        act0 = jnp.zeros((obs.shape[0], self.act_dim))
        critic_params = self.critic.init(k_c, obs, act0)
        target = jax.tree.map(lambda x: jnp.array(x, copy=True), critic_params)
        obs_space = self.env.observation_space
        buffer = ReplayBuffer.create(
            cfg.buffer_size, obs_space.shape, obs_space.dtype,
            (self.act_dim,), jnp.float32,
        )
        obs_norm = RunningNorm.create(obs_space.shape) if self.normalize_obs else None
        if cfg.ent_coef == "auto":
            log_alpha = jnp.zeros(())
        else:
            log_alpha = jnp.log(jnp.asarray(float(cfg.ent_coef)))
        return SACState(
            actor_params=actor_params, critic_params=critic_params,
            target_critic_params=target, log_alpha=log_alpha,
            actor_opt=self._actor_tx.init(actor_params),
            critic_opt=self._critic_tx.init(critic_params),
            alpha_opt=self._alpha_tx.init(log_alpha),
            buffer=buffer, vstate=vstate, obs=obs, obs_norm=obs_norm,
            key=key, global_step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def train_chunk(self, state: SACState, chunk: int):
        cfg = self.config
        auto_alpha = cfg.ent_coef == "auto"

        def update(state, batch, key):
            obs, actions, rewards, next_obs, dones = batch
            k_next, k_pi = jax.random.split(key)
            alpha = jnp.exp(state.log_alpha)

            mean, log_std = self.actor.apply(state.actor_params, next_obs)
            next_act, next_logp = _sample_action(mean, log_std, k_next)
            tq1, tq2 = self.critic.apply(
                state.target_critic_params, next_obs, next_act
            )
            target_q = rewards + cfg.gamma * (1 - dones.astype(jnp.float32)) * (
                jnp.minimum(tq1, tq2) - alpha * next_logp
            )
            target_q = jax.lax.stop_gradient(target_q)

            def critic_loss(cp):
                q1, q2 = self.critic.apply(cp, obs, actions)
                return jnp.mean(jnp.square(q1 - target_q))\
                    + jnp.mean(jnp.square(q2 - target_q))

            closs, cgrads = jax.value_and_grad(critic_loss)(state.critic_params)
            cupd, critic_opt = self._critic_tx.update(
                cgrads, state.critic_opt, state.critic_params
            )
            critic_params = optax.apply_updates(state.critic_params, cupd)

            def actor_loss(ap):
                mean, log_std = self.actor.apply(ap, obs)
                act, logp = _sample_action(mean, log_std, k_pi)
                q1, q2 = self.critic.apply(critic_params, obs, act)
                return jnp.mean(alpha * logp - jnp.minimum(q1, q2)), logp

            (aloss, logp), agrads = jax.value_and_grad(actor_loss, has_aux=True)(
                state.actor_params
            )
            aupd, actor_opt = self._actor_tx.update(
                agrads, state.actor_opt, state.actor_params
            )
            actor_params = optax.apply_updates(state.actor_params, aupd)

            if auto_alpha:
                def alpha_loss(la):
                    return -jnp.mean(
                        la * jax.lax.stop_gradient(logp + self.target_entropy)
                    )

                _, algrads = jax.value_and_grad(alpha_loss)(state.log_alpha)
                alupd, alpha_opt = self._alpha_tx.update(
                    algrads, state.alpha_opt, state.log_alpha
                )
                log_alpha = optax.apply_updates(state.log_alpha, alupd)
            else:
                log_alpha, alpha_opt = state.log_alpha, state.alpha_opt

            target = jax.tree.map(
                lambda t, p: (1 - cfg.tau) * t + cfg.tau * p,
                state.target_critic_params, critic_params,
            )
            return state.replace(
                actor_params=actor_params, critic_params=critic_params,
                target_critic_params=target, log_alpha=log_alpha,
                actor_opt=actor_opt, critic_opt=critic_opt, alpha_opt=alpha_opt,
            )

        def body(state, _):
            key, k_act, k_sample, k_upd = jax.random.split(state.key, 4)
            if state.obs_norm is not None:
                obs_norm = state.obs_norm.update(state.obs)
                norm_obs = obs_norm.normalize(state.obs)
            else:
                obs_norm, norm_obs = state.obs_norm, state.obs

            mean, log_std = self.actor.apply(state.actor_params, norm_obs)
            actions, _ = _sample_action(mean, log_std, k_act)
            # Warmup: uniform random actions before learning_starts.
            rand = jax.random.uniform(
                k_act, actions.shape, minval=-1.0, maxval=1.0
            )
            actions = jnp.where(
                state.global_step < cfg.learning_starts, rand, actions
            )

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
                key=key, global_step=global_step,
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
              callback: Optional[Callable] = None, chunk: int = 64) -> SACState:
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
                     "metrics": {"mean_reward_per_step": float(np.asarray(rewards).mean()),
                                 "alpha": float(jnp.exp(state.log_alpha))},
                     "fps": steps / max(time.time() - t0, 1e-9)},
                    {},
                )
        self.state = state
        return state

    # ---- BaseRLObject surface -------------------------------------------
    @classmethod
    def getOptParam(cls):
        return {
            "learning_rate": (float, (1e-2, 1e-5)),
            "batch_size": (int, (16, 256)),
            "tau": (float, (0, 0.1)),
            "gamma": (float, (0.5, 1)),
            "train_freq": (int, (1, 16)),
        }

    def getAction(self, observation, dones=None, deterministic=True, key=None):
        obs = jnp.asarray(observation)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        mean, log_std = self.actor.apply(self.state.actor_params, obs)
        if deterministic:
            return np.asarray(jnp.tanh(mean))
        if key is None:
            key = self._next_act_key()
        act, _ = _sample_action(mean, log_std, key)
        return np.asarray(act)

    def getActionProba(self, observation, dones=None):
        obs = jnp.asarray(observation)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        mean, _ = self.actor.apply(self.state.actor_params, obs)
        return np.asarray(jnp.tanh(mean))

    def save(self, save_path, _locals=None):
        self._save_pickle(
            save_path,
            {"name": self.name, "config": dataclasses.asdict(self.config),
             "num_envs": self.num_envs, "policy_kind": self.policy_kind,
             "normalize_obs": self.normalize_obs,
             "actor_params": self._to_numpy(self.state.actor_params),
             "critic_params": self._to_numpy(self.state.critic_params),
             "log_alpha": float(self.state.log_alpha),
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
                    config=SACConfig(**d["config"]),
                    normalize_obs=d["normalize_obs"])
        obs_norm = None
        if d["obs_norm"] is not None:
            obs_norm = RunningNorm(
                mean=jnp.asarray(d["obs_norm"]["mean"]),
                var=jnp.asarray(d["obs_norm"]["var"]),
                count=jnp.asarray(d["obs_norm"]["count"]),
            )
        agent.state = SACState(
            actor_params=jax.tree.map(jnp.asarray, d["actor_params"]),
            critic_params=jax.tree.map(jnp.asarray, d["critic_params"]),
            target_critic_params=None, log_alpha=jnp.asarray(d["log_alpha"]),
            actor_opt=None, critic_opt=None, alpha_opt=None, buffer=None,
            vstate=None, obs=None, obs_norm=obs_norm,
            key=jax.random.PRNGKey(0), global_step=jnp.int32(0),
        )
        return agent
