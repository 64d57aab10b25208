"""Observation frame stacking.

Functional replacement for ``VecFrameStack``/``WrapFrameStack``
(rl_baselines/utils.py:114-159,222): the last k observations ride in the env
state and are concatenated along the channel (last) axis. New episodes start
from zeros like stable-baselines' VecFrameStack.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from srl_tpu.core.env import TpuEnv
from srl_tpu.core.spaces import Box, Space


@struct.dataclass
class FrameStackState:
    inner: object
    frames: jax.Array  # [k, ...obs]


class FrameStack(TpuEnv):
    """Stacks the last ``num_stack`` observations along the last axis."""

    def __init__(self, env: TpuEnv, num_stack: int):
        self.env = env
        self.num_stack = int(num_stack)
        self.srl_model = env.srl_model
        self.relative_pos = env.relative_pos
        self.max_steps = env.max_steps

    def __getattr__(self, name):
        return getattr(self.env, name)

    @property
    def action_space(self) -> Space:
        return self.env.action_space

    @property
    def observation_space(self) -> Space:
        inner = self.env.observation_space
        shape = inner.shape[:-1] + (inner.shape[-1] * self.num_stack,)
        low = np.min(inner.low)
        high = np.max(inner.high)
        return Box(low, high, shape, inner.dtype)

    def _observe_inner(self, state):
        return self.env.observe(state)

    def reset(self, key: jax.Array) -> FrameStackState:
        inner = self.env.reset(key)
        obs = self._observe_inner(inner)
        frames = jnp.zeros((self.num_stack,) + obs.shape, obs.dtype)
        frames = frames.at[-1].set(obs)
        return FrameStackState(inner=inner, frames=frames)

    def step(self, state: FrameStackState, action) -> Tuple[FrameStackState, jax.Array, jax.Array]:
        inner, reward, done = self.env.step(state.inner, action)
        obs = self._observe_inner(inner)
        frames = jnp.roll(state.frames, -1, axis=0).at[-1].set(obs)
        return FrameStackState(inner=inner, frames=frames), reward, done

    def observe(self, state: FrameStackState) -> jax.Array:
        # [k, ..., C] -> [..., C*k]
        frames = jnp.moveaxis(state.frames, 0, -1)
        return frames.reshape(frames.shape[:-2] + (-1,))

    def ground_truth(self, state: FrameStackState) -> jax.Array:
        return self.env.ground_truth(state.inner)

    def target_pos(self, state: FrameStackState) -> jax.Array:
        return self.env.target_pos(state.inner)

    def render_pixels(self, state: FrameStackState) -> jax.Array:
        return self.env.render_pixels(state.inner)
