"""Functional environment API and the vectorized auto-resetting wrapper.

This replaces the reference's object-oriented gym stack:

  * ``SRLGymEnv`` (environments/srl_env.py:5-102) — the extended-Gym API with
    ``getSRLState``/``getGroundTruth``/``getTargetPos`` becomes a set of pure
    methods over an immutable ``EnvState`` pytree;
  * ``SubprocVecEnv``/``DummyVecEnv`` selection + ``VecFrameStack`` +
    ``VecNormalize`` (rl_baselines/utils.py:194-229) becomes ``VecEnv``: a
    vmap-batched, jit-compiled, auto-resetting step over thousands of env
    instances in lockstep on a single chip (and sharded across a mesh by the
    caller — the batch axis is the parallelism axis).

Conventions every concrete env follows:

  * ``reset(key) -> state``: state is a ``flax.struct`` pytree with at least
    ``key`` (per-env PRNG state, the analogue of ``np_random`` seeding in
    srl_env.py:71-78), ``step_count`` (int32) and ``terminated`` (bool).
  * ``step(state, action) -> (state', reward, done)``: pure; all stochasticity
    comes from splitting ``state.key``.
  * ``observe(state) -> obs``: observation per the configured ``srl_model``
    mode (ground_truth / raw_pixels / joints / ... — learned-encoder modes
    return raw pixels here; the encoder is applied in-batch by the caller).
"""
from __future__ import annotations

import abc
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from srl_tpu.core.spaces import Space


@struct.dataclass
class Transition:
    """Result of one vectorized env step (post auto-reset)."""

    obs: jax.Array
    reward: jax.Array
    done: jax.Array
    # Episode statistics, valid where ``done`` is True (the Monitor-CSV
    # analogue, environments/utils.py:54): return/length of the episode that
    # just finished.
    episode_return: jax.Array
    episode_length: jax.Array


@struct.dataclass
class VecEnvState:
    env_state: Any  # batched env-specific state pytree
    # Running episode accumulators (the reference's bench.Monitor bookkeeping).
    ep_return: jax.Array  # [N] float32
    ep_length: jax.Array  # [N] int32
    key: jax.Array  # vector key source for auto-resets


class TpuEnv(abc.ABC):
    """Abstract pure-functional environment.

    Concrete envs are plain Python objects whose attributes are *static*
    configuration (closed over at trace time); all dynamic data lives in the
    state pytree.
    """

    # Observation mode, mirroring the reference's srl_model string
    # (state_representation/registry.py:5-30).
    srl_model: str = "ground_truth"
    relative_pos: bool = True
    max_steps: int = 1000

    # ---- required API -------------------------------------------------
    @abc.abstractmethod
    def reset(self, key: jax.Array):
        """Sample a fresh episode state."""

    @abc.abstractmethod
    def step(self, state, action) -> Tuple[Any, jax.Array, jax.Array]:
        """Advance one step: returns (state', reward, done)."""

    @abc.abstractmethod
    def observe(self, state) -> jax.Array:
        """Observation for the configured srl_model mode."""

    @abc.abstractmethod
    def ground_truth(self, state) -> jax.Array:
        """Low-dimensional ground-truth state (robot/gripper position)."""

    @abc.abstractmethod
    def target_pos(self, state) -> jax.Array:
        """Position of the current target."""

    # ---- spaces --------------------------------------------------------
    @property
    @abc.abstractmethod
    def action_space(self) -> Space:
        ...

    @property
    @abc.abstractmethod
    def observation_space(self) -> Space:
        ...

    # ---- shared helpers ------------------------------------------------
    def srl_state(self, state) -> jax.Array:
        """ground-truth SRL state, relative to target when configured
        (srl_env.py:39-42)."""
        gt = self.ground_truth(state)
        if self.relative_pos:
            return gt - self.target_pos(state)
        return gt

    @staticmethod
    def ground_truth_dim() -> int:
        raise NotImplementedError

    def render_pixels(self, state) -> jax.Array:
        """RGB image observation (batched rasterizer); envs override."""
        raise NotImplementedError


class VecEnv:
    """vmap-batched auto-resetting vector environment.

    Stable-baselines VecEnv semantics: when an episode ends, the returned
    observation is the first observation of the *new* episode and ``done`` is
    True for that step; episode statistics for the finished episode ride along
    in the Transition.
    """

    def __new__(cls, env, num_envs: int, *args, **kwargs):
        # Mixed-family configs (core/mixed_env.MixedEnv) vectorize as
        # per-family slices, not one vmap — dispatch transparently so every
        # agent's ``VecEnv(env, n)`` supports heterogeneous batches.
        if cls is VecEnv and getattr(env, "is_mixed_family", False):
            from srl_tpu.core.mixed_env import MixedVecEnv

            return super().__new__(MixedVecEnv)
        return super().__new__(cls)

    def __init__(self, env: TpuEnv, num_envs: int):
        self.env = env
        self.num_envs = num_envs

    # All methods are pure and jit/vmap/shard_map-safe.
    def _observe(self, env_state) -> jax.Array:
        """Batched observation: envs may provide observe_batched (e.g. a
        Pallas renderer whose batch axis is the kernel grid, not vmap)."""
        batched = getattr(self.env, "observe_batched", None)
        if batched is not None:
            return batched(env_state)
        return jax.vmap(self.env.observe)(env_state)

    def reset(self, key: jax.Array) -> Tuple[VecEnvState, jax.Array]:
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, self.num_envs)
        env_state = jax.vmap(self.env.reset)(keys)
        obs = self._observe(env_state)
        n = self.num_envs
        vstate = VecEnvState(
            env_state=env_state,
            ep_return=jnp.zeros((n,), jnp.float32),
            ep_length=jnp.zeros((n,), jnp.int32),
            key=key,
        )
        return vstate, obs

    def step(self, vstate: VecEnvState, actions: jax.Array) -> Tuple[VecEnvState, Transition]:
        env_state, reward, done = jax.vmap(self.env.step)(vstate.env_state, actions)

        ep_return = vstate.ep_return + reward
        ep_length = vstate.ep_length + 1

        # Auto-reset the finished envs with fresh keys; masked-select the
        # whole state pytree (the scan-safe replacement for the reference's
        # per-process VecEnv reset). The reset pass is gated behind a
        # batch-level lax.cond so steps where NO episode finished (the common
        # case — episodes run 250-1500 steps) skip the reset computation
        # entirely; env reset can be as expensive as several steps (Kuka does
        # 5 IK control steps), so paying it only when needed is a large
        # steady-state win. Key consumption is unconditional, so trajectories
        # are bit-identical to the always-reset formulation.
        key, sub = jax.random.split(vstate.key)
        reset_keys = jax.random.split(sub, self.num_envs)

        def _with_reset(cur):
            fresh_state = jax.vmap(self.env.reset)(reset_keys)
            return jax.tree.map(
                lambda fresh, c: jnp.where(
                    done.reshape(done.shape + (1,) * (c.ndim - 1)), fresh, c
                ),
                fresh_state,
                cur,
            )

        # Perf note: this cond only skips the reset pass when step runs
        # under plain jit/scan. Under an outer vmap (or GSPMD contexts that
        # lower cond to select) both branches execute every step and the
        # optimization silently disappears — correctness is unaffected, but
        # don't rely on the skip if you vmap over VecEnv itself.
        env_state = jax.lax.cond(
            jnp.any(done), _with_reset, lambda cur: cur, env_state
        )

        obs = self._observe(env_state)
        transition = Transition(
            obs=obs,
            reward=reward,
            done=done,
            episode_return=jnp.where(done, ep_return, jnp.nan),
            episode_length=jnp.where(done, ep_length, 0),
        )
        new_vstate = VecEnvState(
            env_state=env_state,
            ep_return=jnp.where(done, 0.0, ep_return),
            ep_length=jnp.where(done, 0, ep_length),
            key=key,
        )
        return new_vstate, transition
