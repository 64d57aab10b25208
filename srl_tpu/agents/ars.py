"""ARS — Augmented Random Search, population-batched on device.

Replaces the reference's in-repo numpy ARS
(rl_baselines/evolution_strategies/ars.py:125-194). The reference runs
2*population antithetic rollouts over a SubprocVecEnv and steps members in
Python; here the population is the leading batch axis of a vmapped linear
policy over a VecEnv of 2*population envs, and a full generation (rollout to
episode end + top-k update, ars.py:186-194) is one jitted function.

Defaults from ars.py:47-57: population 10, exploration noise 0.02, step size
0.02, top-2 update, max_step_amplitude 10, v2 observation normalization.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from srl_tpu.agents.base import BaseRLAgent
from srl_tpu.core.env import VecEnv
from srl_tpu.core.normalize import RunningNorm
from srl_tpu.core.spaces import Discrete


@dataclasses.dataclass
class ARSConfig:
    num_population: int = 10
    exploration_noise: float = 0.02
    step_size: float = 0.02
    top_population: int = 2
    max_step_amplitude: float = 10.0
    algo_type: str = "v2"  # v2 = running observation normalization
    deterministic: bool = False
    max_episode_steps: int = 260  # scan cap per generation rollout


class ARS(BaseRLAgent):
    name = "ars"

    def __init__(self, env=None, config: ARSConfig = None):
        super().__init__()
        self.env = env
        self.config = config or ARSConfig()
        assert self.config.top_population <= self.config.num_population
        assert self.config.num_population > 1
        if env is not None:
            self.num_envs = 2 * self.config.num_population
            self.vec_env = VecEnv(env, self.num_envs)
            self.obs_dim = int(np.prod(env.observation_space.shape))
            self.discrete = isinstance(env.action_space, Discrete)
            self.act_dim = (
                env.action_space.n if self.discrete
                else int(np.prod(env.action_space.shape))
            )
            self.M = jnp.zeros((self.obs_dim, self.act_dim), jnp.float32)
            self.obs_norm = (
                RunningNorm.create((self.obs_dim,))
                if self.config.algo_type == "v2" and env.srl_model != "raw_pixels"
                else None
            )

    # ------------------------------------------------------------------
    def _policy_action(self, M, obs, key, deterministic):
        logits = obs.reshape(-1) @ M
        if self.discrete:
            if deterministic:
                return jnp.argmax(logits)
            return jax.random.categorical(key, logits)
        return jnp.clip(logits, -1.0, 1.0)

    def _generation(self, M, obs_norm, key):
        """One ARS generation: sample deltas, roll out 2P antithetic members
        to episode end, top-k update."""
        cfg = self.config
        P = cfg.num_population
        key, k_delta, k_reset, k_roll = jax.random.split(key, 4)
        delta = jax.random.normal(k_delta, (P,) + self.M.shape)
        # Member m = pair p, direction d: M + (1-2d) * sigma * delta_p.
        signs = jnp.tile(jnp.array([1.0, -1.0]), P)
        member_M = (
            M[None] + signs[:, None, None]
            * cfg.exploration_noise * jnp.repeat(delta, 2, axis=0)
        )

        vstate, obs = self.vec_env.reset(k_reset)

        def body(carry, _):
            vstate, obs, done_once, ret, obs_norm, k = carry
            if obs_norm is not None:
                obs_norm = obs_norm.update(obs.reshape(self.num_envs, -1))
                norm_obs = obs_norm.normalize(obs.reshape(self.num_envs, -1))
            else:
                norm_obs = obs.reshape(self.num_envs, -1)
            k, sub = jax.random.split(k)
            act_keys = jax.random.split(sub, self.num_envs)
            actions = jax.vmap(
                lambda M_i, o, kk: self._policy_action(
                    M_i, o, kk, cfg.deterministic
                )
            )(member_M, norm_obs, act_keys)
            if self.discrete:
                actions = actions.astype(jnp.int32)
            vstate, tr = self.vec_env.step(vstate, actions)
            ret = ret + tr.reward * (1.0 - done_once)
            done_once = jnp.maximum(done_once, tr.done.astype(jnp.float32))
            return (vstate, tr.obs, done_once, ret, obs_norm, k), None

        init = (
            vstate, obs, jnp.zeros(self.num_envs), jnp.zeros(self.num_envs),
            obs_norm, k_roll,
        )
        (vstate, _, done_once, ret, obs_norm, _), _ = jax.lax.scan(
            body, init, None, length=cfg.max_episode_steps
        )

        r = ret.reshape(P, 2)
        # Top-k by the best direction (ars.py:186-194).
        order = jnp.argsort(-jnp.max(r, axis=1))
        top = order[: cfg.top_population]
        delta_sum = jnp.einsum("k,kij->ij", r[top, 0] - r[top, 1], delta[top])
        denom = jnp.maximum(
            cfg.top_population * jnp.std(r[top]), 1.0 / cfg.max_step_amplitude
        )
        M = M + cfg.step_size / denom * delta_sum
        return M, obs_norm, key, jnp.mean(r), jnp.max(r)

    # ------------------------------------------------------------------
    def learn(self, total_timesteps: int, seed: int = 0,
              callback: Optional[Callable] = None):
        cfg = self.config
        steps_per_gen = cfg.max_episode_steps * self.num_envs
        n_generations = max(1, int(total_timesteps) // steps_per_gen)
        key = jax.random.PRNGKey(seed)
        M, obs_norm = self.M, self.obs_norm
        gen = jax.jit(self._generation)
        t0 = time.time()
        episode_returns = []
        for g in range(n_generations):
            key, sub = jax.random.split(key)
            M, obs_norm, _, mean_r, max_r = gen(M, obs_norm, sub)
            episode_returns.append(float(mean_r))
            if callback is not None:
                callback(
                    {"self": self, "update": g, "n_updates": n_generations,
                     "num_timesteps": (g + 1) * steps_per_gen,
                     "episode_returns": episode_returns, "episode_lengths": [],
                     "metrics": {"mean_return": float(mean_r),
                                 "max_return": float(max_r)},
                     "state": None,
                     "fps": (g + 1) * steps_per_gen / max(time.time() - t0, 1e-9)},
                    {},
                )
        self.M, self.obs_norm = M, obs_norm
        self.state = (M, obs_norm)
        return M

    # ------------------------------------------------------------------
    def customArguments(self, parser):
        super().customArguments(parser)
        parser.add_argument("--num-population", type=int, default=10)
        parser.add_argument("--exploration-noise", type=float, default=0.02)
        parser.add_argument("--step-size", type=float, default=0.02)
        parser.add_argument("--top-population", type=int, default=2)
        parser.add_argument("--algo-type", type=str, default="v2",
                            choices=["v1", "v2"])
        parser.add_argument("--max-step-amplitude", type=float, default=10.0)
        parser.add_argument("--deterministic", action="store_true", default=False)
        return parser

    @classmethod
    def getOptParam(cls):
        # ars.py:92-102
        return {
            "top_population": (int, (1, 5)),
            "exploration_noise": (float, (0, 0.1)),
            "num_population": (int, (5, 50)),
            "step_size": (float, (0, 0.1)),
            "max_step_amplitude": (float, (1, 100)),
        }

    def getAction(self, observation, dones=None, deterministic=True, key=None):
        obs = np.asarray(observation).reshape(len(observation), -1)
        if self.obs_norm is not None:
            obs = np.asarray(self.obs_norm.normalize(jnp.asarray(obs)))
        logits = obs @ np.asarray(self.M)
        if self.discrete:
            return np.argmax(logits, axis=-1)
        return np.clip(logits, -1, 1)

    def getActionProba(self, observation, dones=None):
        from srl_tpu.utils.logging import softmax

        obs = np.asarray(observation).reshape(len(observation), -1)
        logits = obs @ np.asarray(self.M)
        return softmax(logits) if self.discrete else logits

    def save(self, save_path, _locals=None):
        payload = {
            "name": self.name,
            "config": dataclasses.asdict(self.config),
            "M": np.asarray(self.M),
            "obs_norm": (
                {"mean": np.asarray(self.obs_norm.mean),
                 "var": np.asarray(self.obs_norm.var),
                 "count": float(self.obs_norm.count)}
                if self.obs_norm is not None else None
            ),
        }
        self._save_pickle(save_path, payload)

    @classmethod
    def load(cls, load_path, env=None, args=None):
        d = cls._load_pickle(load_path)
        agent = cls(env=env, config=ARSConfig(**d["config"]))
        agent.M = jnp.asarray(d["M"])
        if d["obs_norm"] is not None:
            agent.obs_norm = RunningNorm(
                mean=jnp.asarray(d["obs_norm"]["mean"]),
                var=jnp.asarray(d["obs_norm"]["var"]),
                count=jnp.asarray(d["obs_norm"]["count"]),
            )
        agent.state = (agent.M, agent.obs_norm)
        return agent
