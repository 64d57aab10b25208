"""TRPO — trust-region policy optimization, fully on-device.

Replaces stable-baselines TRPO as wrapped by rl_baselines/rl_algorithm/trpo.py
(an "MPI implementation", trpo.py:13) with its defaults: 1024 steps per
batch, max_kl 0.01, 10 CG iterations, cg_damping 0.1, gamma 0.99, lam 0.98,
3 value-function Adam iterations at 3e-4, entcoeff 0.0.

The natural-gradient step runs inside jit: Fisher-vector products via
double-backprop (JVP of the KL gradient), conjugate gradient as a
lax.fori_loop, and backtracking line search as a lax.while_loop. The MPI
allreduce becomes the dp-mesh psum XLA inserts when the batch axis is
sharded.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

from srl_tpu.agents.base import BaseRLAgent
from srl_tpu.agents.common import collect_rollout, compute_gae
from srl_tpu.agents.ppo import PPOState
from srl_tpu.core.env import VecEnv
from srl_tpu.core.normalize import RunningNorm
from srl_tpu.core.spaces import Discrete
from srl_tpu.models.policies import make_policy
from srl_tpu.models.distributions import Categorical, DiagGaussian


@dataclasses.dataclass
class TRPOConfig:
    n_steps: int = 128  # per env; total batch = n_steps * num_envs
    max_kl: float = 0.01
    cg_iters: int = 10
    cg_damping: float = 0.1
    gamma: float = 0.99
    lam: float = 0.98
    vf_iters: int = 3
    vf_stepsize: float = 3e-4
    entcoeff: float = 0.0
    ls_steps: int = 10  # backtracking line-search steps


def _kl(dist_a, dist_b):
    if isinstance(dist_a, Categorical):
        pa = jax.nn.log_softmax(dist_a.logits)
        pb = jax.nn.log_softmax(dist_b.logits)
        return jnp.sum(jnp.exp(pa) * (pa - pb), axis=-1)
    # Diagonal Gaussians.
    va = jnp.exp(2 * dist_a.log_std)
    vb = jnp.exp(2 * dist_b.log_std)
    return jnp.sum(
        dist_b.log_std - dist_a.log_std
        + (va + jnp.square(dist_a.mean - dist_b.mean)) / (2 * vb) - 0.5,
        axis=-1,
    )


class TRPO(BaseRLAgent):
    name = "trpo"

    def __init__(self, env=None, num_envs: int = 8, policy: str = "auto",
                 config: TRPOConfig = None, normalize_obs: Optional[bool] = None):
        super().__init__()
        self.env = env
        self.num_envs = num_envs
        self.config = config or TRPOConfig()
        self.policy_kind = policy
        if env is not None:
            self.vec_env = VecEnv(env, num_envs)
            self.policy = make_policy(
                env.action_space, env.observation_space.shape, policy
            )
            if normalize_obs is None:
                normalize_obs = env.srl_model != "raw_pixels"
            self.normalize_obs = normalize_obs
            self._vf_tx = optax.adam(self.config.vf_stepsize)

    def init_state(self, key, n_updates: int = 1) -> PPOState:
        key, k_env, k_params = jax.random.split(key, 3)
        vstate, obs = self.vec_env.reset(k_env)
        params = self.policy.init(k_params, obs)
        opt_state = self._vf_tx.init(params)
        obs_norm = (
            RunningNorm.create(self.env.observation_space.shape)
            if self.normalize_obs else None
        )
        return PPOState(params=params, opt_state=opt_state, vstate=vstate,
                        obs=obs, obs_norm=obs_norm, key=key,
                        update_idx=jnp.int32(0))

    # ------------------------------------------------------------------
    def train_iteration(self, state: PPOState):
        cfg = self.config
        key, k_roll = jax.random.split(state.key)
        vstate, obs, obs_norm, last_norm_obs, batch = collect_rollout(
            self.vec_env, self.policy.apply, state.params, state.vstate,
            state.obs, state.obs_norm, k_roll, cfg.n_steps,
        )
        _, last_value = self.policy.apply(state.params, last_norm_obs)
        advantages, returns = compute_gae(
            batch.rewards, batch.values, batch.dones, last_value,
            cfg.gamma, cfg.lam,
        )
        t, n = cfg.n_steps, self.num_envs
        flat = lambda x: x.reshape((t * n,) + x.shape[2:])
        b_obs = flat(batch.obs)
        b_act = flat(batch.actions)
        b_logp = flat(batch.log_probs)
        b_adv = flat(advantages)
        b_adv = (b_adv - jnp.mean(b_adv)) / (jnp.std(b_adv) + 1e-8)
        b_ret = flat(returns)

        flat_params, unravel = ravel_pytree(state.params)
        old_dist, _ = self.policy.apply(state.params, b_obs)
        old_dist = jax.tree.map(jax.lax.stop_gradient, old_dist)

        def surrogate(fp):
            dist, _ = self.policy.apply(unravel(fp), b_obs)
            logp = dist.log_prob(b_act)
            ratio = jnp.exp(logp - b_logp)
            ent = jnp.mean(dist.entropy())
            return jnp.mean(ratio * b_adv) + cfg.entcoeff * ent

        def mean_kl(fp):
            dist, _ = self.policy.apply(unravel(fp), b_obs)
            return jnp.mean(_kl(old_dist, dist))

        g = jax.grad(surrogate)(flat_params)

        def fvp(v):
            # Fisher-vector product via JVP of the KL gradient + damping.
            grad_kl = jax.grad(mean_kl)
            _, hvp = jax.jvp(grad_kl, (flat_params,), (v,))
            return hvp + cfg.cg_damping * v

        # Conjugate gradient solve F x = g.
        def cg_body(i, carry):
            x, r, p, rr = carry
            Ap = fvp(p)
            alpha = rr / (jnp.dot(p, Ap) + 1e-10)
            x = x + alpha * p
            r = r - alpha * Ap
            rr_new = jnp.dot(r, r)
            p = r + (rr_new / (rr + 1e-10)) * p
            return (x, r, p, rr_new)

        x0 = jnp.zeros_like(g)
        x, _, _, _ = jax.lax.fori_loop(
            0, cfg.cg_iters, cg_body, (x0, g, g, jnp.dot(g, g))
        )

        # Step size from the trust region: sqrt(2 max_kl / x^T F x).
        xFx = jnp.dot(x, fvp(x))
        full_step = x * jnp.sqrt(2 * cfg.max_kl / jnp.maximum(xFx, 1e-10))
        expected_improve = jnp.dot(g, full_step)
        surr_before = surrogate(flat_params)

        # Backtracking line search (lax.while_loop).
        def ls_cond(carry):
            i, accepted, _ = carry
            return (~accepted) & (i < cfg.ls_steps)

        def ls_body(carry):
            i, _, _ = carry
            stepfrac = 0.5**i
            candidate = flat_params + stepfrac * full_step
            improve = surrogate(candidate) - surr_before
            kl = mean_kl(candidate)
            ok = (improve > 0) & (kl <= cfg.max_kl * 1.5)
            return (i + 1, ok, candidate)

        _, accepted, candidate = jax.lax.while_loop(
            ls_cond, ls_body, (0, jnp.bool_(False), flat_params)
        )
        new_flat = jnp.where(accepted, candidate, flat_params)
        params = unravel(new_flat)

        # Value function: a few Adam steps on the shared network's vf head
        # (the policy net is shared; only vf loss gradients flow).
        def vf_loss(p):
            _, v = self.policy.apply(p, b_obs)
            return jnp.mean(jnp.square(v - b_ret))

        opt_state = state.opt_state

        def vf_step(carry, _):
            p, o = carry
            grads = jax.grad(vf_loss)(p)
            updates, o = self._vf_tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), None

        (params, opt_state), _ = jax.lax.scan(
            vf_step, (params, opt_state), None, length=cfg.vf_iters
        )

        metrics = {
            "surrogate_improve": surrogate(new_flat) - surr_before,
            "kl": mean_kl(new_flat),
            "line_search_accepted": accepted.astype(jnp.float32),
            "episode_return": batch.episode_return,
            "episode_length": batch.episode_length,
            "mean_reward_per_step": jnp.mean(batch.rewards),
        }
        new_state = PPOState(
            params=params, opt_state=opt_state, vstate=vstate, obs=obs,
            obs_norm=obs_norm, key=key, update_idx=state.update_idx + 1,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def learn(self, total_timesteps: int, seed: int = 0,
              callback: Optional[Callable] = None) -> PPOState:
        cfg = self.config
        steps_per_update = cfg.n_steps * self.num_envs
        n_updates = max(1, total_timesteps // steps_per_update)
        state = self.init_state(jax.random.PRNGKey(seed), n_updates)
        jit_iter = self._jit_train_iteration()
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
            "max_kl": (float, (0.001, 0.1)),
            "gamma": (float, (0.5, 1)),
            "lam": (float, (0, 1)),
            "entcoeff": (float, (0, 1)),
            "cg_damping": (float, (0.01, 1)),
            "vf_stepsize": (float, (1e-2, 1e-5)),
            "n_steps": (int, (32, 2048)),
        }

    def getAction(self, observation, dones=None, deterministic=False, key=None):
        obs = jnp.asarray(observation)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        dist, _ = self.policy.apply(self.state.params, obs)
        if deterministic:
            return np.asarray(dist.mode())
        if key is None:
            key = self._next_act_key()
        return np.asarray(dist.sample(key))

    def getActionProba(self, observation, dones=None):
        obs = jnp.asarray(observation)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        dist, _ = self.policy.apply(self.state.params, obs)
        if isinstance(self.env.action_space, Discrete):
            return np.asarray(dist.probs())
        return np.asarray(dist.mean)

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
                    config=TRPOConfig(**d["config"]),
                    normalize_obs=d["normalize_obs"])
        obs_norm = None
        if d["obs_norm"] is not None:
            obs_norm = RunningNorm(
                mean=jnp.asarray(d["obs_norm"]["mean"]),
                var=jnp.asarray(d["obs_norm"]["var"]),
                count=jnp.asarray(d["obs_norm"]["count"]),
            )
        agent.state = PPOState(
            params=jax.tree.map(jnp.asarray, d["params"]), opt_state=None,
            vstate=None, obs=None, obs_norm=obs_norm,
            key=jax.random.PRNGKey(0), update_idx=jnp.int32(0),
        )
        return agent
