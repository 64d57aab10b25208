"""Random-action baseline agent (rl_baselines/random_agent.py:28-41),
with the same FPS printout behavior — except the rollout is one jitted scan."""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from srl_tpu.agents.base import BaseRLAgent
from srl_tpu.core.env import VecEnv
from srl_tpu.utils.logging import printGreen


class RandomAgent(BaseRLAgent):
    name = "random_agent"

    def __init__(self, env=None, num_envs: int = 16):
        super().__init__()
        self.env = env
        self.num_envs = num_envs
        if env is not None:
            self.vec_env = VecEnv(env, num_envs)

    def learn(self, total_timesteps: int, seed: int = 0,
              callback: Optional[Callable] = None):
        env = self.env
        vec = self.vec_env
        n_act = getattr(env.action_space, "n", None)
        num_envs = self.num_envs
        chunk = 256

        @jax.jit
        def run(vstate, key):
            def body(carry, _):
                vs, k = carry
                k, sub = jax.random.split(k)
                if n_act is not None:
                    actions = jax.random.randint(sub, (num_envs,), 0, n_act)
                else:
                    actions = jax.random.uniform(
                        sub, (num_envs,) + env.action_space.shape,
                        minval=-1, maxval=1,
                    )
                vs, tr = vec.step(vs, actions)
                return (vs, k), (tr.reward, tr.episode_return)

            (vs, k), out = jax.lax.scan(body, (vstate, key), None, length=chunk)
            return vs, k, out

        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        vstate, _ = vec.reset(sub)
        t0 = time.time()
        steps = 0
        episode_returns = []
        while steps < total_timesteps:
            vstate, key, (rewards, ep_ret) = run(vstate, key)
            steps += chunk * num_envs
            er = np.asarray(ep_ret)
            episode_returns.extend(er[~np.isnan(er)].tolist())
            fps = steps / max(time.time() - t0, 1e-9)
            printGreen(f"{steps} steps - {fps:.0f} FPS")
            if callback is not None:
                callback(
                    {"self": self, "num_timesteps": steps, "fps": fps,
                     "episode_returns": episode_returns,
                     "episode_lengths": [], "update": steps,
                     "n_updates": total_timesteps, "state": None,
                     "metrics": {"mean_reward_per_step": float(np.asarray(rewards).mean())}},
                    {},
                )
        self.state = vstate
        return vstate

    def getAction(self, observation, dones=None, deterministic=False, key=None):
        n = np.asarray(observation).shape[0]
        n_act = getattr(self.env.action_space, "n", None)
        rng = np.random.RandomState()
        if n_act is not None:
            return rng.randint(0, n_act, size=n)
        return rng.uniform(-1, 1, size=(n,) + self.env.action_space.shape)

    def getActionProba(self, observation, dones=None):
        n = np.asarray(observation).shape[0]
        n_act = getattr(self.env.action_space, "n", None)
        if n_act is not None:
            return np.full((n, n_act), 1.0 / n_act)
        return np.zeros((n,) + self.env.action_space.shape)

    def save(self, save_path, _locals=None):
        self._save_pickle(save_path, {"name": self.name, "num_envs": self.num_envs})

    @classmethod
    def load(cls, load_path, env=None, args=None):
        d = cls._load_pickle(load_path)
        return cls(env=env, num_envs=d["num_envs"])
