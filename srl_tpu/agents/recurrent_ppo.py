"""Recurrent (LSTM) PPO2.

The reference's ppo2 with lstm/lnlstm/cnnlstm policies and its tuned
hyperparameters (ppo2.py:46-57): n_steps=609, ent 0.0642, lr 0.00492,
vf 0.0562, max_grad_norm 0.1923, gamma 0.9752, lam 0.3988, 4 minibatches,
8 epochs. Minibatches are groups of whole env sequences (the reference
requires num_cpu % 4 == 0 for recurrent policies, ppo2.py:42-43 — same
constraint here: num_envs % nminibatches == 0), and each minibatch re-runs
the LSTM over the segment from the stored initial hidden state.
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
from srl_tpu.agents.common import compute_gae
from srl_tpu.agents.ppo import PPOConfig
from srl_tpu.core.env import VecEnv
from srl_tpu.core.normalize import RunningNorm
from srl_tpu.core.spaces import Discrete
from srl_tpu.models.recurrent import make_recurrent_policy


def lstm_ppo_config() -> PPOConfig:
    return PPOConfig(
        n_steps=609, nminibatches=4, noptepochs=8, cliprange=0.2,
        learning_rate=0.004923676735761618, lr_linear_decay=False,
        ent_coef=0.06415865069774951, vf_coef=0.056219345567007695,
        max_grad_norm=0.19232704980689763, gamma=0.9752388470759489,
        lam=0.3987544314875193,
    )


@struct.dataclass
class RecurrentPPOState:
    params: dict
    opt_state: optax.OptState
    vstate: object
    obs: jax.Array
    done: jax.Array  # [N] episode-start mask for the next step
    lstm_state: tuple
    obs_norm: Optional[RunningNorm]
    key: jax.Array
    update_idx: jax.Array


class RecurrentPPO2(BaseRLAgent):
    name = "ppo2"  # same algo surface, lstm policy variant

    def __init__(self, env=None, num_envs: int = 16, policy: str = "lstm",
                 config: PPOConfig = None, normalize_obs: Optional[bool] = None):
        super().__init__()
        self.env = env
        self.num_envs = num_envs
        self.config = config or lstm_ppo_config()
        assert num_envs % self.config.nminibatches == 0, (
            "Error: recurrent policies need num_envs to be a multiple of "
            "nminibatches (ppo2.py:42-43)"
        )
        self.policy_kind = policy
        if env is not None:
            self.vec_env = VecEnv(env, num_envs)
            self.policy = make_recurrent_policy(env.action_space, policy)
            if normalize_obs is None:
                normalize_obs = env.srl_model != "raw_pixels"
            self.normalize_obs = normalize_obs
            self._tx = None

    def _make_optimizer(self, n_updates):
        cfg = self.config
        steps = cfg.noptepochs * cfg.nminibatches
        if cfg.lr_linear_decay:
            lr = lambda count: cfg.learning_rate * jnp.maximum(
                1.0 - (count // steps) / max(n_updates, 1), 0.0
            )
        else:
            lr = cfg.learning_rate
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(lr, eps=cfg.adam_eps),
        )

    def init_state(self, key, n_updates: int = 1000) -> RecurrentPPOState:
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

    # ------------------------------------------------------------------
    def train_iteration(self, state: RecurrentPPOState):
        cfg = self.config
        key, k_roll, k_perm = jax.random.split(state.key, 3)
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
            logp = dist.log_prob(action)
            vstate, tr = self.vec_env.step(vstate, action)
            out = (norm_obs, done, action, logp, value, tr.reward, tr.done,
                   tr.episode_return, tr.episode_length)
            return (vstate, tr.obs, tr.done, new_lstm, obs_norm), out

        step_keys = jax.random.split(k_roll, cfg.n_steps)
        (vstate, obs, done, lstm_state, obs_norm), (
            b_obs, b_done_in, b_act, b_logp, b_val, b_rew, b_done_out,
            ep_ret, ep_len,
        ) = jax.lax.scan(
            body,
            (state.vstate, state.obs, state.done, init_lstm, state.obs_norm),
            step_keys,
        )

        last_norm = obs_norm.normalize(obs) if obs_norm is not None else obs
        _, last_value, _ = self.policy.apply(
            state.params, last_norm, lstm_state, done
        )
        advantages, returns = compute_gae(
            b_rew, b_val, b_done_out, last_value, cfg.gamma, cfg.lam
        )

        n_mb = cfg.nminibatches
        envs_per_mb = self.num_envs // n_mb

        def mb_loss(params, env_idx):
            obs_mb = b_obs[:, env_idx]
            done_mb = b_done_in[:, env_idx]
            act_mb = b_act[:, env_idx]
            logp_mb = b_logp[:, env_idx]
            val_mb = b_val[:, env_idx]
            adv_mb = advantages[:, env_idx]
            ret_mb = returns[:, env_idx]
            adv_mb = (adv_mb - jnp.mean(adv_mb)) / (jnp.std(adv_mb) + 1e-8)
            lstm0 = (init_lstm[0][env_idx], init_lstm[1][env_idx])

            def scan_policy(carry, inp):
                lstm = carry
                o, d = inp
                dist, v, lstm = self.policy.apply(params, o, lstm, d)
                return lstm, (dist, v)

            _, (dists, vpred) = jax.lax.scan(
                scan_policy, lstm0, (obs_mb, done_mb)
            )
            # dists is a stacked distribution NamedTuple of [T, mb, ...] arrays.
            logp = dists.log_prob(act_mb)
            entropy = jnp.mean(dists.entropy())
            ratio = jnp.exp(logp - logp_mb)
            pg1 = -adv_mb * ratio
            pg2 = -adv_mb * jnp.clip(ratio, 1 - cfg.cliprange, 1 + cfg.cliprange)
            pg_loss = jnp.mean(jnp.maximum(pg1, pg2))
            v_clipped = val_mb + jnp.clip(
                vpred - val_mb, -cfg.cliprange, cfg.cliprange
            )
            vf_loss = 0.5 * jnp.mean(
                jnp.maximum(jnp.square(vpred - ret_mb),
                            jnp.square(v_clipped - ret_mb))
            )
            return pg_loss - cfg.ent_coef * entropy + cfg.vf_coef * vf_loss

        def epoch(carry, k_epoch):
            params, opt_state = carry
            perm = jax.random.permutation(k_epoch, self.num_envs)

            def mb_step(carry, i):
                params, opt_state = carry
                env_idx = jax.lax.dynamic_slice_in_dim(
                    perm, i * envs_per_mb, envs_per_mb
                )
                loss, grads = jax.value_and_grad(mb_loss)(params, env_idx)
                updates, opt_state = self._tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                mb_step, (params, opt_state), jnp.arange(n_mb)
            )
            return (params, opt_state), losses

        epoch_keys = jax.random.split(k_perm, cfg.noptepochs)
        (params, opt_state), losses = jax.lax.scan(
            epoch, (state.params, state.opt_state), epoch_keys
        )

        metrics = {
            "loss": jnp.mean(losses),
            "episode_return": ep_ret,
            "episode_length": ep_len,
            "mean_reward_per_step": jnp.mean(b_rew),
        }
        new_state = RecurrentPPOState(
            params=params, opt_state=opt_state, vstate=vstate, obs=obs,
            done=done, lstm_state=lstm_state, obs_norm=obs_norm, key=key,
            update_idx=state.update_idx + 1,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def learn(self, total_timesteps: int, seed: int = 0,
              callback: Optional[Callable] = None) -> RecurrentPPOState:
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

    # ---- acting ---------------------------------------------------------
    def getAction(self, observation, dones=None, deterministic=False, key=None):
        """Stateful acting for replay: keeps the LSTM state between calls."""
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
        acted from (read, not advanced); zeros only before any call —
        matching stable-baselines' action_probability on recurrent
        policies."""
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

    def save(self, save_path, _locals=None):
        self._save_pickle(
            save_path,
            {"name": "ppo2_lstm", "config": dataclasses.asdict(self.config),
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
                    config=PPOConfig(**d["config"]),
                    normalize_obs=d["normalize_obs"])
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
