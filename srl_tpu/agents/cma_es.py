"""CMA-ES over policy parameters, population-batched on device.

Replaces rl_baselines/evolution_strategies/cma_es.py (which drives the `cma`
package over flattened PyTorch policy params, cma_es.py:104-140): the full
covariance-matrix-adaptation update (Hansen's standard algorithm — rank-1 +
rank-mu covariance update, sigma path) runs host-side in numpy (parameter
dim is small), while the whole population is evaluated in lock-step as the
batch axis of a vmapped policy over a VecEnv — one jitted rollout per
generation instead of the reference's per-member Python stepping
(cma_es.py:111-138).

Defaults from cma_es.py:53-56,309-310: population 20, sigma 0.14, mu0 = 0,
MLP policy with one 100-unit hidden layer (raw_pixels: small CNN).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from srl_tpu.agents.base import BaseRLAgent
from srl_tpu.core.env import VecEnv
from srl_tpu.core.spaces import Discrete
from srl_tpu.utils.logging import softmax


class _MLPPolicy(nn.Module):
    # MLPPolicyPytorch equivalent (cma_es.py:304-326): in -> 100 -> out.
    out_dim: int
    hidden: int = 100

    @nn.compact
    def __call__(self, x):
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.out_dim)(x)


class _CNNPolicy(nn.Module):
    # CNNPolicyPytorch equivalent (cma_es.py:259-301), sans batchnorm.
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32) / 255.0
        x = nn.relu(nn.Conv(8, (5, 5), strides=(2, 2))(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(16, (3, 3), strides=(2, 2))(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(32, (3, 3), strides=(2, 2))(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(self.out_dim)(x)


@dataclasses.dataclass
class CMAESConfig:
    num_population: int = 20
    mu: float = 0.0
    sigma: float = 0.14
    deterministic: bool = False
    max_episode_steps: int = 260


class CMAES(BaseRLAgent):
    name = "cma-es"

    def __init__(self, env=None, config: CMAESConfig = None):
        super().__init__()
        self.env = env
        self.config = config or CMAESConfig()
        if env is not None:
            self.num_envs = self.config.num_population
            self.vec_env = VecEnv(env, self.num_envs)
            self.discrete = isinstance(env.action_space, Discrete)
            out_dim = (
                env.action_space.n if self.discrete
                else int(np.prod(env.action_space.shape))
            )
            if len(env.observation_space.shape) == 3:
                self.net = _CNNPolicy(out_dim)
            else:
                self.net = _MLPPolicy(out_dim)
            sample = jnp.zeros((1,) + env.observation_space.shape,
                               env.observation_space.dtype)
            params0 = self.net.init(jax.random.PRNGKey(0), sample)
            from jax.flatten_util import ravel_pytree

            flat0, self._unravel = ravel_pytree(params0)
            self.dim = flat0.shape[0]
            self.best_model = np.full(self.dim, self.config.mu, np.float32)

    # ------------------------------------------------------------------
    def _policy_logits(self, flat_params, obs):
        params = self._unravel(flat_params)
        return self.net.apply(params, obs[None])[0]

    def _eval_population(self, pop_flat, key):
        """Episode returns [P] for a [P, dim] parameter population."""
        cfg = self.config
        key, k_reset, k_roll = jax.random.split(key, 3)
        vstate, obs = self.vec_env.reset(k_reset)

        def body(carry, _):
            vstate, obs, done_once, ret, k = carry
            k, sub = jax.random.split(k)
            act_keys = jax.random.split(sub, self.num_envs)

            def act(flat, o, kk):
                logits = self._policy_logits(flat, o)
                if self.discrete:
                    if cfg.deterministic:
                        return jnp.argmax(logits).astype(jnp.int32)
                    return jax.random.categorical(kk, logits).astype(jnp.int32)
                return jnp.clip(logits, -1.0, 1.0)

            actions = jax.vmap(act)(pop_flat, obs, act_keys)
            vstate, tr = self.vec_env.step(vstate, actions)
            ret = ret + tr.reward * (1.0 - done_once)
            done_once = jnp.maximum(done_once, tr.done.astype(jnp.float32))
            return (vstate, tr.obs, done_once, ret, k), None

        init = (vstate, obs, jnp.zeros(self.num_envs), jnp.zeros(self.num_envs), k_roll)
        (_, _, _, ret, _), _ = jax.lax.scan(
            body, init, None, length=cfg.max_episode_steps
        )
        return ret

    # ------------------------------------------------------------------
    def learn(self, total_timesteps: int, seed: int = 0,
              callback: Optional[Callable] = None):
        cfg = self.config
        P = cfg.num_population
        n = self.dim

        # --- standard CMA-ES constants (Hansen) ---
        mu_sel = P // 2
        weights = np.log(mu_sel + 0.5) - np.log(np.arange(1, mu_sel + 1))
        weights /= weights.sum()
        mueff = 1.0 / np.sum(weights**2)
        cc = (4 + mueff / n) / (n + 4 + 2 * mueff / n)
        cs = (mueff + 2) / (n + mueff + 5)
        c1 = 2 / ((n + 1.3) ** 2 + mueff)
        cmu = min(1 - c1, 2 * (mueff - 2 + 1 / mueff) / ((n + 2) ** 2 + mueff))
        damps = 1 + 2 * max(0, np.sqrt((mueff - 1) / (n + 1)) - 1) + cs
        chi_n = np.sqrt(n) * (1 - 1 / (4 * n) + 1 / (21 * n**2))

        mean = np.full(n, cfg.mu, np.float64)
        sigma = cfg.sigma
        C = np.eye(n)
        ps = np.zeros(n)
        pc = np.zeros(n)
        B, D = np.eye(n), np.ones(n)
        eigen_stale = True

        eval_pop = jax.jit(self._eval_population)
        key = jax.random.PRNGKey(seed)
        rng = np.random.RandomState(seed)

        steps_per_gen = cfg.max_episode_steps * P
        n_generations = max(1, int(total_timesteps) // steps_per_gen)
        t0 = time.time()
        episode_returns = []
        best_r = -np.inf
        for g in range(n_generations):
            if eigen_stale:
                D2, B = np.linalg.eigh(C)
                D = np.sqrt(np.maximum(D2, 1e-20))
                eigen_stale = False
            z = rng.randn(P, n)
            y = z @ np.diag(D) @ B.T
            pop = mean[None] + sigma * y

            key, sub = jax.random.split(key)
            r = np.asarray(eval_pop(jnp.asarray(pop, jnp.float32), sub))
            episode_returns.append(float(r.mean()))

            order = np.argsort(-r)  # maximize reward = minimize -r
            if r[order[0]] > best_r:
                best_r = r[order[0]]
                self.best_model = pop[order[0]].astype(np.float32)

            sel = order[:mu_sel]
            y_w = weights @ y[sel]
            mean = mean + sigma * y_w

            # Evolution paths.
            C_inv_sqrt = B @ np.diag(1.0 / D) @ B.T
            ps = (1 - cs) * ps + np.sqrt(cs * (2 - cs) * mueff) * (C_inv_sqrt @ y_w)
            h_sig = (
                np.linalg.norm(ps)
                / np.sqrt(1 - (1 - cs) ** (2 * (g + 1)))
                < (1.4 + 2 / (n + 1)) * chi_n
            )
            pc = (1 - cc) * pc + h_sig * np.sqrt(cc * (2 - cc) * mueff) * y_w

            # Covariance update (rank-1 + rank-mu).
            artmp = y[sel]
            C = (
                (1 - c1 - cmu) * C
                + c1 * (np.outer(pc, pc) + (not h_sig) * cc * (2 - cc) * C)
                + cmu * artmp.T @ np.diag(weights) @ artmp
            )
            sigma = sigma * np.exp((cs / damps) * (np.linalg.norm(ps) / chi_n - 1))
            eigen_stale = True

            if callback is not None:
                callback(
                    {"self": self, "update": g, "n_updates": n_generations,
                     "num_timesteps": (g + 1) * steps_per_gen,
                     "episode_returns": episode_returns, "episode_lengths": [],
                     "metrics": {"mean_return": float(r.mean()),
                                 "best_return": float(best_r),
                                 "sigma": float(sigma)},
                     "state": None,
                     "fps": (g + 1) * steps_per_gen / max(time.time() - t0, 1e-9)},
                    {},
                )
        self.state = self.best_model
        return self.best_model

    # ------------------------------------------------------------------
    def customArguments(self, parser):
        super().customArguments(parser)
        parser.add_argument("--num-population", type=int, default=20)
        parser.add_argument("--mu", type=float, default=0.0)
        parser.add_argument("--sigma", type=float, default=0.14)
        parser.add_argument("--deterministic", action="store_true", default=False)
        return parser

    @classmethod
    def getOptParam(cls):
        return {"sigma": (float, (0, 0.2))}  # cma_es.py:74-77

    def getAction(self, observation, dones=None, deterministic=True, key=None):
        obs = jnp.asarray(observation)
        logits = self.net.apply(self._unravel(jnp.asarray(self.best_model)), obs)
        if self.discrete:
            return np.asarray(jnp.argmax(logits, axis=-1))
        return np.clip(np.asarray(logits), -1, 1)

    def getActionProba(self, observation, dones=None):
        obs = jnp.asarray(observation)
        logits = np.asarray(
            self.net.apply(self._unravel(jnp.asarray(self.best_model)), obs)
        )
        return softmax(logits) if self.discrete else logits

    def save(self, save_path, _locals=None):
        self._save_pickle(
            save_path,
            {"name": self.name, "config": dataclasses.asdict(self.config),
             "best_model": np.asarray(self.best_model)},
        )

    @classmethod
    def load(cls, load_path, env=None, args=None):
        d = cls._load_pickle(load_path)
        agent = cls(env=env, config=CMAESConfig(**d["config"]))
        agent.best_model = d["best_model"]
        agent.state = agent.best_model
        return agent
