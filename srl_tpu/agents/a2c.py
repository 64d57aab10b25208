"""A2C — synchronous advantage actor-critic, on-device.

Replaces stable-baselines A2C as wrapped by rl_baselines/rl_algorithm/a2c.py
with the same defaults (a2c.py:43-54): n_steps=5, vf_coef 0.5(*), ent_coef
0.01, max_grad_norm 0.5, RMSProp(lr 7e-4, alpha 0.99, eps 1e-5), gamma 0.99,
lr schedules constant/linear/... (a2c.py:20-21).

One train iteration = 5-step scan rollout + single full-batch gradient step.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from srl_tpu.agents.base import BaseRLAgent
from srl_tpu.agents.common import collect_rollout, compute_gae, explained_variance
from srl_tpu.agents.ppo import PPOState  # same train-state shape
from srl_tpu.core.env import VecEnv
from srl_tpu.core.normalize import RunningNorm
from srl_tpu.core.spaces import Discrete
from srl_tpu.models.policies import make_policy


@dataclasses.dataclass
class A2CConfig:
    n_steps: int = 5
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    max_grad_norm: float = 0.5
    learning_rate: float = 7e-4
    epsilon: float = 1e-5
    alpha: float = 0.99
    gamma: float = 0.99
    lr_schedule: str = "constant"


class A2C(BaseRLAgent):
    name = "a2c"
    SAVE_INTERVAL = 10  # a2c.py:12

    def __init__(self, env=None, num_envs: int = 16, policy: str = "auto",
                 config: A2CConfig = None, normalize_obs: Optional[bool] = None):
        super().__init__()
        self.env = env
        self.num_envs = num_envs
        self.config = config or A2CConfig()
        self.policy_kind = policy
        if env is not None:
            self.vec_env = VecEnv(env, num_envs)
            self.policy = make_policy(env.action_space, env.observation_space.shape, policy)
            if normalize_obs is None:
                normalize_obs = env.srl_model != "raw_pixels"
            self.normalize_obs = normalize_obs
            self._tx = None

    def _make_optimizer(self, n_updates: int):
        cfg = self.config
        if cfg.lr_schedule == "linear":
            sched = lambda count: cfg.learning_rate * jnp.maximum(
                1.0 - count / max(n_updates, 1), 0.0
            )
        else:  # constant (and the exotic schedules degrade to constant)
            sched = cfg.learning_rate
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.rmsprop(sched, decay=cfg.alpha, eps=cfg.epsilon),
        )

    def init_state(self, key: jax.Array, n_updates: int = 1000) -> PPOState:
        key, k_env, k_params = jax.random.split(key, 3)
        vstate, obs = self.vec_env.reset(k_env)
        params = self.policy.init(k_params, obs)
        if getattr(self, "_tx", None) is None or \
                getattr(self, "_n_updates_hint", None) != n_updates:
            self._tx = self._make_optimizer(n_updates)
        self._n_updates_hint = n_updates
        opt_state = self._tx.init(params)
        obs_norm = (
            RunningNorm.create(self.env.observation_space.shape)
            if self.normalize_obs
            else None
        )
        return PPOState(
            params=params, opt_state=opt_state, vstate=vstate, obs=obs,
            obs_norm=obs_norm, key=key, update_idx=jnp.int32(0),
        )

    def train_iteration(self, state: PPOState):
        cfg = self.config
        key, k_roll = jax.random.split(state.key)
        vstate, obs, obs_norm, last_norm_obs, batch = collect_rollout(
            self.vec_env, self.policy.apply, state.params, state.vstate,
            state.obs, state.obs_norm, k_roll, cfg.n_steps,
        )
        _, last_value = self.policy.apply(state.params, last_norm_obs)
        # A2C: discounted returns, no GAE (lambda = 1).
        advantages, returns = compute_gae(
            batch.rewards, batch.values, batch.dones, last_value, cfg.gamma, 1.0
        )

        t, n = cfg.n_steps, self.num_envs
        flat = lambda x: x.reshape((t * n,) + x.shape[2:])

        def loss_fn(params):
            dist, vpred = self.policy.apply(params, flat(batch.obs))
            logp = dist.log_prob(flat(batch.actions))
            adv = jax.lax.stop_gradient(flat(advantages))
            pg_loss = -jnp.mean(adv * logp)
            vf_loss = jnp.mean(jnp.square(vpred - flat(returns)))
            entropy = jnp.mean(dist.entropy())
            total = pg_loss + cfg.vf_coef * vf_loss - cfg.ent_coef * entropy
            return total, {"pg_loss": pg_loss, "vf_loss": vf_loss, "entropy": entropy}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self._tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = dict(aux)
        metrics["explained_variance"] = explained_variance(
            flat(batch.values), flat(returns)
        )
        metrics["episode_return"] = batch.episode_return
        metrics["episode_length"] = batch.episode_length
        metrics["mean_reward_per_step"] = jnp.mean(batch.rewards)

        return (
            PPOState(
                params=params, opt_state=opt_state, vstate=vstate, obs=obs,
                obs_norm=obs_norm, key=key, update_idx=state.update_idx + 1,
            ),
            metrics,
        )

    def learn(self, total_timesteps: int, seed: int = 0,
              callback: Optional[Callable] = None) -> PPOState:
        cfg = self.config
        steps_per_update = cfg.n_steps * self.num_envs
        n_updates = max(1, total_timesteps // steps_per_update)
        state = self.init_state(jax.random.PRNGKey(seed), n_updates)
        jit_iter = self._jit_train_iteration()

        episode_returns, episode_lengths = [], []
        t_start = time.time()
        for update in range(n_updates):
            state, metrics = jit_iter(state)
            self.state = state
            ep_ret = np.asarray(metrics["episode_return"])
            finished = ~np.isnan(ep_ret)
            if finished.any():
                episode_returns.extend(ep_ret[finished].tolist())
                episode_lengths.extend(
                    np.asarray(metrics["episode_length"])[finished].tolist()
                )
            if callback is not None:
                callback(
                    {
                        "self": self, "state": state, "update": update,
                        "n_updates": n_updates,
                        "num_timesteps": (update + 1) * steps_per_update,
                        "episode_returns": episode_returns,
                        "episode_lengths": episode_lengths,
                        "metrics": metrics,
                        "fps": (update + 1) * steps_per_update
                        / max(time.time() - t_start, 1e-9),
                    },
                    {},
                )
        self.state = state
        return state

    # ---- BaseRLObject surface -------------------------------------------
    @classmethod
    def getOptParam(cls):
        # a2c.py:25-37
        return {
            "n_steps": (int, (1, 100)),
            "vf_coef": (float, (0, 1)),
            "ent_coef": (float, (0, 1)),
            "max_grad_norm": (float, (0.1, 5)),
            "learning_rate": (float, (0, 0.1)),
            "epsilon": (float, (0, 0.01)),
            "alpha": (float, (0.5, 1)),
            "gamma": (float, (0.5, 1)),
            "lr_schedule": (
                (list, str),
                ["linear", "constant", "double_linear_con", "middle_drop",
                 "double_middle_drop"],
            ),
        }

    def customArguments(self, parser):
        super().customArguments(parser)
        parser.add_argument(
            "--lr-schedule", help="Learning rate schedule", default="constant",
            choices=["linear", "constant", "double_linear_con", "middle_drop",
                     "double_middle_drop"],
        )
        return parser

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

    def save(self, save_path: str, _locals=None):
        self._save_pickle(
            save_path,
            {
                "name": self.name,
                "config": dataclasses.asdict(self.config),
                "num_envs": self.num_envs,
                "policy_kind": self.policy_kind,
                "normalize_obs": self.normalize_obs,
                "params": self._to_numpy(self.state.params),
                "obs_norm": (
                    self._to_numpy(
                        {"mean": self.state.obs_norm.mean,
                         "var": self.state.obs_norm.var,
                         "count": self.state.obs_norm.count}
                    )
                    if self.state.obs_norm is not None else None
                ),
            },
        )

    @classmethod
    def load(cls, load_path: str, env=None, args=None) -> "A2C":
        d = cls._load_pickle(load_path)
        agent = cls(
            env=env, num_envs=d["num_envs"], policy=d["policy_kind"],
            config=A2CConfig(**d["config"]), normalize_obs=d["normalize_obs"],
        )
        params = jax.tree.map(jnp.asarray, d["params"])
        obs_norm = None
        if d["obs_norm"] is not None:
            obs_norm = RunningNorm(
                mean=jnp.asarray(d["obs_norm"]["mean"]),
                var=jnp.asarray(d["obs_norm"]["var"]),
                count=jnp.asarray(d["obs_norm"]["count"]),
            )
        agent.state = PPOState(
            params=params, opt_state=None, vstate=None, obs=None,
            obs_norm=obs_norm, key=jax.random.PRNGKey(0), update_idx=jnp.int32(0),
        )
        return agent


class RecurrentA2C(A2C):
    """A2C with an lstm/lnlstm/cnnlstm policy.

    The reference hands recurrent stable-baselines policies to every
    actor-critic algo through the shared policy selector
    (base_classes.py:227-246); A2C is its other everyday on-policy
    algorithm (rl_algorithm/a2c.py:39-56). Semantics match
    stable-baselines' recurrent A2C: the rollout carries hidden state
    (zeroed at episode boundaries via the `done` mask) and the single
    full-batch gradient step re-runs the LSTM over the whole [T, N]
    segment from the stored initial hidden state, so gradients flow
    through time (truncated BPTT over n_steps)."""

    def __init__(self, env=None, num_envs: int = 16, policy: str = "lstm",
                 config: A2CConfig = None, normalize_obs: Optional[bool] = None):
        from srl_tpu.models.recurrent import make_recurrent_policy

        BaseRLAgent.__init__(self)
        self.env = env
        self.num_envs = num_envs
        self.config = config or A2CConfig()
        self.policy_kind = policy
        if env is not None:
            self.vec_env = VecEnv(env, num_envs)
            self.policy = make_recurrent_policy(env.action_space, policy)
            if normalize_obs is None:
                normalize_obs = env.srl_model != "raw_pixels"
            self.normalize_obs = normalize_obs
            self._tx = None

    def init_state(self, key: jax.Array, n_updates: int = 1000):
        from srl_tpu.agents.recurrent_ppo import RecurrentPPOState

        key, k_env, k_p = jax.random.split(key, 3)
        vstate, obs = self.vec_env.reset(k_env)
        done0 = jnp.zeros(self.num_envs, bool)
        lstm0 = (jnp.zeros((self.num_envs, self.policy.n_lstm)),
                 jnp.zeros((self.num_envs, self.policy.n_lstm)))
        params = self.policy.init(k_p, obs, lstm0, done0)
        if getattr(self, "_tx", None) is None or \
                getattr(self, "_n_updates_hint", None) != n_updates:
            self._tx = self._make_optimizer(n_updates)
        self._n_updates_hint = n_updates
        obs_norm = (
            RunningNorm.create(self.env.observation_space.shape)
            if self.normalize_obs else None
        )
        return RecurrentPPOState(
            params=params, opt_state=self._tx.init(params), vstate=vstate,
            obs=obs, done=done0, lstm_state=lstm0, obs_norm=obs_norm,
            key=key, update_idx=jnp.int32(0),
        )

    def train_iteration(self, state):
        from srl_tpu.agents.recurrent_ppo import RecurrentPPOState

        cfg = self.config
        key, k_roll = jax.random.split(state.key)
        init_lstm = state.lstm_state

        def body(carry, k_step):
            vstate, obs, done, lstm_state, obs_norm = carry
            if obs_norm is not None:
                obs_norm = obs_norm.update(obs)
                norm_obs = obs_norm.normalize(obs)
            else:
                norm_obs = obs
            dist, value, new_lstm = self.policy.apply(
                state.params, norm_obs, lstm_state, done
            )
            action = dist.sample(k_step)
            vstate, tr = self.vec_env.step(vstate, action)
            out = (norm_obs, done, action, value, tr.reward, tr.done,
                   tr.episode_return, tr.episode_length)
            return (vstate, tr.obs, tr.done, new_lstm, obs_norm), out

        step_keys = jax.random.split(k_roll, cfg.n_steps)
        (vstate, obs, done, lstm_state, obs_norm), (
            b_obs, b_done_in, b_act, b_val, b_rew, b_done_out, ep_ret, ep_len,
        ) = jax.lax.scan(
            body,
            (state.vstate, state.obs, state.done, init_lstm, state.obs_norm),
            step_keys,
        )

        last_norm = obs_norm.normalize(obs) if obs_norm is not None else obs
        _, last_value, _ = self.policy.apply(
            state.params, last_norm, lstm_state, done
        )
        # A2C: discounted returns, no GAE (lambda = 1).
        advantages, returns = compute_gae(
            b_rew, b_val, b_done_out, last_value, cfg.gamma, 1.0
        )

        def loss_fn(params):
            def scan_policy(lstm, inp):
                o, d = inp
                dist, v, lstm = self.policy.apply(params, o, lstm, d)
                return lstm, (dist, v)

            _, (dists, vpred) = jax.lax.scan(
                scan_policy, init_lstm, (b_obs, b_done_in)
            )
            logp = dists.log_prob(b_act)
            adv = jax.lax.stop_gradient(advantages)
            pg_loss = -jnp.mean(adv * logp)
            vf_loss = jnp.mean(jnp.square(vpred - returns))
            entropy = jnp.mean(dists.entropy())
            total = pg_loss + cfg.vf_coef * vf_loss - cfg.ent_coef * entropy
            return total, {"pg_loss": pg_loss, "vf_loss": vf_loss,
                           "entropy": entropy}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self._tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = dict(aux)
        metrics["explained_variance"] = explained_variance(
            b_val.reshape(-1), returns.reshape(-1)
        )
        metrics["episode_return"] = ep_ret
        metrics["episode_length"] = ep_len
        metrics["mean_reward_per_step"] = jnp.mean(b_rew)

        return (
            RecurrentPPOState(
                params=params, opt_state=opt_state, vstate=vstate, obs=obs,
                done=done, lstm_state=lstm_state, obs_norm=obs_norm, key=key,
                update_idx=state.update_idx + 1,
            ),
            metrics,
        )

    # ---- acting (stateful LSTM, as RecurrentPPO2) ------------------------
    def getAction(self, observation, dones=None, deterministic=False, key=None):
        obs = jnp.asarray(observation)
        n = obs.shape[0]
        if not hasattr(self, "_act_lstm") or self._act_lstm[0].shape[0] != n:
            self._act_lstm = (jnp.zeros((n, self.policy.n_lstm)),
                              jnp.zeros((n, self.policy.n_lstm)))
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        done = (jnp.zeros(n, bool) if dones is None
                else jnp.asarray(dones, bool))
        # Pre-advance context so getActionProba can report the distribution
        # this call actually acted from (not a zeroed-state one).
        self._act_ctx = (self._act_lstm, done)
        dist, _, self._act_lstm = self.policy.apply(
            self.state.params, obs, self._act_lstm, done
        )
        if deterministic:
            return np.asarray(dist.mode())
        if key is None:
            key = self._next_act_key()
        return np.asarray(dist.sample(key))

    def getActionProba(self, observation, dones=None):
        """Probabilities from the SAME LSTM context the last ``getAction``
        acted from (read, not advanced); zeros only before any call."""
        obs = jnp.asarray(observation)
        n = obs.shape[0]
        ctx = getattr(self, "_act_ctx", None)
        if ctx is not None and ctx[0][0].shape[0] >= n:
            lstm = (ctx[0][0][:n], ctx[0][1][:n])
            done = ctx[1][:n]
        else:
            lstm = (jnp.zeros((n, self.policy.n_lstm)),
                    jnp.zeros((n, self.policy.n_lstm)))
            done = jnp.zeros(n, bool)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        dist, _, _ = self.policy.apply(
            self.state.params, obs, lstm, done
        )
        if isinstance(self.env.action_space, Discrete):
            return np.asarray(dist.probs())
        return np.asarray(dist.mean)

    def save(self, save_path: str, _locals=None):
        self._save_pickle(
            save_path,
            {
                "name": "a2c_lstm",
                "config": dataclasses.asdict(self.config),
                "num_envs": self.num_envs,
                "policy_kind": self.policy_kind,
                "normalize_obs": self.normalize_obs,
                "params": self._to_numpy(self.state.params),
                "obs_norm": (
                    self._to_numpy(
                        {"mean": self.state.obs_norm.mean,
                         "var": self.state.obs_norm.var,
                         "count": self.state.obs_norm.count}
                    )
                    if self.state.obs_norm is not None else None
                ),
            },
        )

    @classmethod
    def load(cls, load_path: str, env=None, args=None) -> "RecurrentA2C":
        from srl_tpu.agents.recurrent_ppo import RecurrentPPOState

        d = cls._load_pickle(load_path)
        agent = cls(
            env=env, num_envs=d["num_envs"], policy=d["policy_kind"],
            config=A2CConfig(**d["config"]), normalize_obs=d["normalize_obs"],
        )
        obs_norm = None
        if d["obs_norm"] is not None:
            obs_norm = RunningNorm(
                mean=jnp.asarray(d["obs_norm"]["mean"]),
                var=jnp.asarray(d["obs_norm"]["var"]),
                count=jnp.asarray(d["obs_norm"]["count"]),
            )
        agent.state = RecurrentPPOState(
            params=jax.tree.map(jnp.asarray, d["params"]), opt_state=None,
            vstate=None, obs=None, done=None, lstm_state=None,
            obs_norm=obs_norm, key=jax.random.PRNGKey(0),
            update_idx=jnp.int32(0),
        )
        return agent
