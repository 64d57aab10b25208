"""Shared on-device RL machinery: rollouts, GAE, train state.

The reference's hot loop — 128 policy steps against subprocess VecEnvs then
minibatch SGD on GPU (SURVEY §3.1) — becomes a single jitted function: a
``lax.scan`` over vmapped env steps fused with the policy forward pass, then
scanned minibatch epochs, with zero host round-trips.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from srl_tpu.core.env import VecEnv, VecEnvState
from srl_tpu.core.normalize import RunningNorm


@struct.dataclass
class RolloutBatch:
    """[T, N, ...] tensors from one rollout segment.

    ``obs`` is either the stacked (normalized) observations, or — when the
    rollout was collected with ``store_states=True`` — the stacked env-state
    PYTREE from which each observation renders. Pixel rollouts store
    ~150 KB/frame as observations but only ~100 B/env as states: storing
    states and re-rendering per minibatch trades cheap renderer FLOPs for
    the dominant HBM slab (the [T*N, 224, 224, 3] buffer that capped the
    pixel PPO loop at 256 envs on 16 GB)."""

    obs: Any
    actions: jax.Array
    log_probs: jax.Array
    values: jax.Array
    rewards: jax.Array
    dones: jax.Array
    episode_return: jax.Array  # NaN except where done
    episode_length: jax.Array


def collect_rollout(
    vec_env: VecEnv,
    apply_fn: Callable,
    params,
    vstate: VecEnvState,
    obs: jax.Array,
    obs_norm: Optional[RunningNorm],
    key: jax.Array,
    n_steps: int,
    store_states: bool = False,
) -> Tuple[VecEnvState, jax.Array, Optional[RunningNorm], jax.Array, RolloutBatch]:
    """Scan n_steps of (policy -> env.step -> autoreset).

    Observation normalization statistics update online during collection,
    matching VecNormalize-on-the-fly semantics (rl_baselines/utils.py:224-227).
    Returns (vstate', last_obs, obs_norm', last_norm_obs, batch).

    ``store_states=True`` records the pre-step env-state pytree instead of
    the observation (``vec_env._observe(state_t) == obs_t`` by the VecEnv
    contract: ``tr.obs`` is the post-autoreset observation of the new
    state); requires ``obs_norm is None`` since re-rendering cannot replay
    mid-rollout normalizer statistics.
    """
    assert not (store_states and obs_norm is not None), (
        "store_states re-renders observations in the update; online "
        "normalization statistics cannot be replayed"
    )

    def body(carry, _):
        vstate, obs, obs_norm, key = carry
        if obs_norm is not None:
            obs_norm = obs_norm.update(obs)
            norm_obs = obs_norm.normalize(obs)
        else:
            norm_obs = obs
        key, k_act = jax.random.split(key)
        dist, value = apply_fn(params, norm_obs)
        action = dist.sample(k_act)
        log_prob = dist.log_prob(action)
        # Mixed-family vstates are tuples without .env_state; store_states
        # is gated to plain VecEnvs by the agents, so only touch it there.
        pre_step_state = vstate.env_state if store_states else None
        vstate, tr = vec_env.step(vstate, action)
        out = RolloutBatch(
            obs=pre_step_state if store_states else norm_obs,
            actions=action,
            log_probs=log_prob,
            values=value,
            rewards=tr.reward,
            dones=tr.done,
            episode_return=tr.episode_return,
            episode_length=tr.episode_length,
        )
        return (vstate, tr.obs, obs_norm, key), out

    (vstate, obs, obs_norm, key), batch = jax.lax.scan(
        body, (vstate, obs, obs_norm, key), None, length=n_steps
    )
    if obs_norm is not None:
        last_norm_obs = obs_norm.normalize(obs)
    else:
        last_norm_obs = obs
    return vstate, obs, obs_norm, last_norm_obs, batch


def compute_gae(
    rewards: jax.Array,  # [T, N]
    values: jax.Array,  # [T, N]
    dones: jax.Array,  # [T, N] done AFTER step t (obs t+1 is fresh if True)
    last_value: jax.Array,  # [N]
    gamma: float,
    lam: float,
) -> Tuple[jax.Array, jax.Array]:
    """Generalized advantage estimation via reverse scan.

    Matches stable-baselines PPO2's discount/bootstrap logic: a done at step t
    cuts the bootstrap from t+1.
    """

    def body(carry, inp):
        gae_next, value_next = carry
        reward, value, done = inp
        not_done = 1.0 - done.astype(jnp.float32)
        delta = reward + gamma * value_next * not_done - value
        gae = delta + gamma * lam * not_done * gae_next
        return (gae, value), gae

    (last_gae, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones),
        reverse=True,
    )
    returns = advantages + values
    return advantages, returns


def explained_variance(y_pred: jax.Array, y_true: jax.Array) -> jax.Array:
    var_y = jnp.var(y_true)
    return jnp.where(var_y == 0, jnp.nan, 1 - jnp.var(y_true - y_pred) / var_y)
