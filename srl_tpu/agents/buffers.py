"""On-device replay buffers (uniform and proportional-prioritized).

Replaces stable-baselines' host-side ReplayBuffer/PrioritizedReplayBuffer
used by DQN/DDPG/SAC in the reference: fixed-capacity device arrays with a
circular write cursor, sampled inside the jitted training step (no
host<->device transfer per sample). Proportional priorities are sampled with
a categorical over p^alpha — O(N) on the VPU, which beats a host sum-tree for
the reference's buffer sizes (deepq.py:23 defaults to 1e3).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    obs: jax.Array  # [C, ...]
    actions: jax.Array  # [C, ...]
    rewards: jax.Array  # [C]
    next_obs: jax.Array  # [C, ...]
    dones: jax.Array  # [C]
    priorities: jax.Array  # [C]
    cursor: jax.Array  # int32
    size: jax.Array  # int32

    @classmethod
    def create(cls, capacity: int, obs_shape, obs_dtype, action_shape, action_dtype):
        return cls(
            obs=jnp.zeros((capacity,) + tuple(obs_shape), obs_dtype),
            actions=jnp.zeros((capacity,) + tuple(action_shape), action_dtype),
            rewards=jnp.zeros((capacity,), jnp.float32),
            next_obs=jnp.zeros((capacity,) + tuple(obs_shape), obs_dtype),
            dones=jnp.zeros((capacity,), jnp.bool_),
            priorities=jnp.zeros((capacity,), jnp.float32),
            cursor=jnp.int32(0),
            size=jnp.int32(0),
        )

    @property
    def capacity(self) -> int:
        return self.obs.shape[0]

    def add_batch(self, obs, actions, rewards, next_obs, dones) -> "ReplayBuffer":
        """Insert a [B, ...] batch at the circular cursor."""
        b = obs.shape[0]
        idx = (self.cursor + jnp.arange(b)) % self.capacity
        max_prio = jnp.maximum(jnp.max(self.priorities), 1.0)
        return self.replace(
            obs=self.obs.at[idx].set(obs),
            actions=self.actions.at[idx].set(actions),
            rewards=self.rewards.at[idx].set(rewards),
            next_obs=self.next_obs.at[idx].set(next_obs),
            dones=self.dones.at[idx].set(dones),
            priorities=self.priorities.at[idx].set(max_prio),
            cursor=(self.cursor + b) % self.capacity,
            size=jnp.minimum(self.size + b, self.capacity),
        )

    def sample_uniform(self, key: jax.Array, batch_size: int):
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(self.size, 1))
        return idx, self._gather(idx), jnp.ones((batch_size,), jnp.float32)

    def sample_prioritized(self, key: jax.Array, batch_size: int,
                           alpha: float, beta: jax.Array):
        valid = jnp.arange(self.capacity) < self.size
        p = jnp.where(valid, jnp.power(self.priorities + 1e-6, alpha), 0.0)
        probs = p / jnp.maximum(jnp.sum(p), 1e-8)
        idx = jax.random.categorical(
            key, jnp.log(jnp.maximum(probs, 1e-30)), shape=(batch_size,)
        )
        n = jnp.maximum(self.size.astype(jnp.float32), 1.0)
        weights = jnp.power(n * probs[idx] + 1e-8, -beta)
        weights = weights / jnp.maximum(jnp.max(weights), 1e-8)
        return idx, self._gather(idx), weights

    def update_priorities(self, idx, td_errors) -> "ReplayBuffer":
        return self.replace(
            priorities=self.priorities.at[idx].set(jnp.abs(td_errors) + 1e-6)
        )

    def _gather(self, idx):
        return (
            self.obs[idx],
            self.actions[idx],
            self.rewards[idx],
            self.next_obs[idx],
            self.dones[idx],
        )
