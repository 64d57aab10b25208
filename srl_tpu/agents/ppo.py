"""PPO2 — the workhorse algorithm, as a fully on-device actor-learner.

Replaces stable-baselines PPO2 as wrapped by the reference
(rl_baselines/rl_algorithm/ppo2.py:38-73) with identical default
hyperparameters (ppo2.py:59-71): n_steps=128, 4 minibatches, 4 epochs,
clip 0.2, lr f*2.5e-4 linearly annealed, ent_coef 0.01, vf_coef 0.5,
max_grad_norm 0.5, gamma 0.99, lam 0.95.

One ``train_iteration`` = scan-rollout (policy+env fused) + GAE + shuffled
minibatch epochs, all inside a single jit; the env batch axis is the
data-parallel axis when sharded over a mesh (psum gradient collectives are
inserted by XLA from the sharding annotations).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from srl_tpu.agents.base import BaseRLAgent
from srl_tpu.agents.common import RolloutBatch, collect_rollout, compute_gae, explained_variance
from srl_tpu.core.env import VecEnv
from srl_tpu.core.normalize import RunningNorm
from srl_tpu.core.spaces import Discrete
from srl_tpu.models.policies import ActorCritic, make_policy


@dataclasses.dataclass
class PPOConfig:
    n_steps: int = 128
    nminibatches: int = 4
    noptepochs: int = 4
    cliprange: float = 0.2
    learning_rate: float = 2.5e-4
    lr_linear_decay: bool = True  # "lambda f: f * 2.5e-4" (ppo2.py:63)
    ent_coef: float = 0.01
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    gamma: float = 0.99
    lam: float = 0.95
    adam_eps: float = 1e-5


@struct.dataclass
class PPOState:
    params: dict
    opt_state: optax.OptState
    vstate: object
    obs: jax.Array
    obs_norm: Optional[RunningNorm]
    key: jax.Array
    update_idx: jax.Array  # int32


class PPO2(BaseRLAgent):
    name = "ppo2"
    LOG_INTERVAL = 10  # ppo2.py:12
    SAVE_INTERVAL = 1  # ppo2.py:13

    def __init__(self, env=None, num_envs: int = 16, policy: str = "auto",
                 config: PPOConfig = None, normalize_obs: Optional[bool] = None,
                 env_align: Optional[int] = None,
                 recompute_obs: bool = False, remat_policy: bool = False):
        super().__init__()
        self.env = env
        self.num_envs = num_envs
        self.config = config or PPOConfig()
        self.policy_kind = policy
        # Mixed-family pods: family-slice alignment (num_envs // dp of the
        # training mesh) so each dp device holds ONE family; None auto-aligns
        # to jax.device_count() (core/mixed_env.default_align).
        self.env_align = env_align
        # Pixel-loop memory levers (both bit-change the schedule, not the
        # math):
        #  * recompute_obs: store the ~100 B/env env-state pytree in the
        #    rollout instead of the ~150 KB/frame observation and re-render
        #    each minibatch inside the update — removes the [T*N, 224, 224,
        #    3] HBM slab that capped pixel training at 256 envs on 16 GB.
        #  * remat_policy: jax.checkpoint the policy forward in the loss so
        #    the backward pass recomputes conv activations instead of
        #    holding them.
        self.recompute_obs = recompute_obs
        self.remat_policy = remat_policy
        if env is not None:
            self._setup(normalize_obs)

    def _setup(self, normalize_obs):
        env = self.env
        if getattr(env, "is_mixed_family", False):
            self.vec_env = VecEnv(env, self.num_envs, align=self.env_align)
        else:
            self.vec_env = VecEnv(env, self.num_envs)
        obs_shape = env.observation_space.shape
        # Coarse-obs envs (KukaButtonEnv(coarse_obs=True)) hand the traced
        # half-resolution image to the policy; the CNN folds the 2x
        # upsample into conv1 exactly (models/policies._Conv1).
        self.policy: ActorCritic = make_policy(
            env.action_space, obs_shape, self.policy_kind,
            input_scale=getattr(env, "obs_coarse_scale", 1),
        )
        # VecNormalize only for non-pixel observations (utils.py:222-227).
        if normalize_obs is None:
            normalize_obs = env.srl_model != "raw_pixels"
        self.normalize_obs = normalize_obs
        if self.recompute_obs:
            assert not self.normalize_obs, (
                "recompute_obs re-renders observations in the update; "
                "online normalizer statistics cannot be replayed — use it "
                "for raw_pixels (unnormalized) training"
            )
            assert not getattr(env, "is_mixed_family", False), (
                "recompute_obs is not wired for mixed-family batches yet"
            )
            from srl_tpu.core.frame_stack import FrameStack

            assert not isinstance(env, FrameStack), (
                "recompute_obs with FrameStack would store the stacked "
                "frame buffer per step (num_stack x the slab it removes) "
                "— drop --recompute-obs or --num-stack"
            )
        self._tx = None
        self._n_updates_hint = 1

    # ------------------------------------------------------------------
    def _make_optimizer(self, n_updates: int) -> optax.GradientTransformation:
        cfg = self.config
        steps_per_update = cfg.noptepochs * cfg.nminibatches

        if cfg.lr_linear_decay:
            def lr_schedule(count):
                update = count // steps_per_update
                frac = 1.0 - update / jnp.maximum(n_updates, 1)
                return cfg.learning_rate * jnp.maximum(frac, 0.0)
        else:
            lr_schedule = cfg.learning_rate
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(lr_schedule, eps=cfg.adam_eps),
        )

    def init_state(self, key: jax.Array, n_updates: int = 1000) -> PPOState:
        key, k_env, k_params = jax.random.split(key, 3)
        vstate, obs = self.vec_env.reset(k_env)
        params = self.policy.init(k_params, obs)
        # Keep the same optimizer object when the lr-anneal horizon is
        # unchanged so learn()'s jit cache (keyed on id(self._tx)) stays
        # warm across calls.
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
            params=params,
            opt_state=opt_state,
            vstate=vstate,
            obs=obs,
            obs_norm=obs_norm,
            key=key,
            update_idx=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _loss(self, params, minibatch, cliprange):
        obs, actions, old_logp, old_values, advantages, returns = minibatch
        if self.recompute_obs:
            # `obs` is the gathered env-state pytree: render this
            # minibatch's frames on the fly. stop_gradient is load-bearing:
            # without it value_and_grad linearizes THROUGH the renderer
            # (jvp taping) and XLA keeps the upsample's [mb, H, s, W, s, 3]
            # broadcast alive as an HLO temp — measured 12.25 GB at
            # mb=32768, the difference between fitting 1024 envs and OOM.
            # No gradient flows into the render anyway (frames are inputs,
            # not functions of params).
            obs = jax.lax.stop_gradient(self.vec_env._observe(obs))
        apply_fn = self.policy.apply
        if self.remat_policy:
            apply_fn = jax.checkpoint(apply_fn)
        dist, vpred = apply_fn(params, obs)
        logp = dist.log_prob(actions)
        entropy = jnp.mean(dist.entropy())

        # Per-minibatch advantage normalization (stable-baselines PPO2).
        advantages = (advantages - jnp.mean(advantages)) / (jnp.std(advantages) + 1e-8)

        ratio = jnp.exp(logp - old_logp)
        pg1 = -advantages * ratio
        pg2 = -advantages * jnp.clip(ratio, 1.0 - cliprange, 1.0 + cliprange)
        pg_loss = jnp.mean(jnp.maximum(pg1, pg2))

        vpred_clipped = old_values + jnp.clip(
            vpred - old_values, -cliprange, cliprange
        )
        vf1 = jnp.square(vpred - returns)
        vf2 = jnp.square(vpred_clipped - returns)
        vf_loss = 0.5 * jnp.mean(jnp.maximum(vf1, vf2))

        cfg = self.config
        total = pg_loss - cfg.ent_coef * entropy + cfg.vf_coef * vf_loss
        approx_kl = 0.5 * jnp.mean(jnp.square(logp - old_logp))
        clip_frac = jnp.mean((jnp.abs(ratio - 1.0) > cliprange).astype(jnp.float32))
        return total, {
            "pg_loss": pg_loss,
            "vf_loss": vf_loss,
            "entropy": entropy,
            "approx_kl": approx_kl,
            "clip_frac": clip_frac,
        }

    def train_iteration(self, state: PPOState):
        """One full PPO update (rollout + optimize); pure & jittable."""
        cfg = self.config
        key, k_roll, k_perm = jax.random.split(state.key, 3)

        vstate, obs, obs_norm, last_norm_obs, batch = collect_rollout(
            self.vec_env,
            self.policy.apply,
            state.params,
            state.vstate,
            state.obs,
            state.obs_norm,
            k_roll,
            cfg.n_steps,
            store_states=self.recompute_obs,
        )
        _, last_value = self.policy.apply(state.params, last_norm_obs)
        advantages, returns = compute_gae(
            batch.rewards,
            batch.values,
            batch.dones,
            last_value,
            cfg.gamma,
            cfg.lam,
        )

        t, n = cfg.n_steps, self.num_envs
        flat = lambda x: x.reshape((t * n,) + x.shape[2:])
        # With recompute_obs, batch.obs is the stored env-state PYTREE
        # ([T, N, ...] per leaf) — flatten every leaf; minibatch gathers
        # then slice the pytree and _loss re-renders the frames.
        obs_data = jax.tree.map(flat, batch.obs)
        data = (
            obs_data,
            flat(batch.actions),
            flat(batch.log_probs),
            flat(batch.values),
            flat(advantages),
            flat(returns),
        )

        batch_size = t * n
        mb_size = batch_size // cfg.nminibatches

        def epoch(carry, k_epoch):
            params, opt_state = carry
            perm = jax.random.permutation(k_epoch, batch_size)

            def minibatch_step(carry, mb_idx):
                params, opt_state = carry
                # Gather each minibatch by permuted indices instead of
                # materializing a full shuffled copy of `data`: for pixel
                # rollouts the [T*N, 224, 224, 3] slab is GBs, and the
                # extra shuffled copy was what capped the pixel loop at
                # 128 envs on 16 GB HBM. Same indices, same minibatches —
                # bit-identical updates.
                idxs = jax.lax.dynamic_slice_in_dim(
                    perm, mb_idx * mb_size, mb_size
                )
                mb = jax.tree.map(lambda x: x[idxs], data)
                (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                    params, mb, cfg.cliprange
                )
                updates, opt_state = self._tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            (params, opt_state), auxs = jax.lax.scan(
                minibatch_step, (params, opt_state), jnp.arange(cfg.nminibatches)
            )
            return (params, opt_state), auxs

        epoch_keys = jax.random.split(k_perm, cfg.noptepochs)
        (params, opt_state), auxs = jax.lax.scan(
            epoch, (state.params, state.opt_state), epoch_keys
        )

        metrics = jax.tree.map(lambda x: jnp.mean(x), auxs)
        metrics["explained_variance"] = explained_variance(
            flat(batch.values), flat(returns)
        )
        # Episode stats for the Monitor/callback layer: [T, N] masked arrays.
        metrics["episode_return"] = batch.episode_return
        metrics["episode_length"] = batch.episode_length
        metrics["mean_reward_per_step"] = jnp.mean(batch.rewards)

        new_state = PPOState(
            params=params,
            opt_state=opt_state,
            vstate=vstate,
            obs=obs,
            obs_norm=obs_norm,
            key=key,
            update_idx=state.update_idx + 1,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def learn(
        self,
        total_timesteps: int,
        seed: int = 0,
        callback: Optional[Callable] = None,
        log_interval: Optional[int] = None,
        updates_per_call: int = 1,
        initial_state: Optional[PPOState] = None,
    ) -> PPOState:
        """Host-side driver: repeatedly invoke the jitted train_iteration and
        surface episode stats (train.py:111-169 callback semantics).

        ``updates_per_call > 1`` scans that many full PPO updates inside ONE
        jit call — the TPU-idiomatic mode: host<->device round-trips happen
        once per K updates instead of per update (callback granularity drops
        to K accordingly)."""
        cfg = self.config
        steps_per_update = cfg.n_steps * self.num_envs
        n_updates = max(1, total_timesteps // steps_per_update)
        k = max(1, min(updates_per_call, n_updates))

        if initial_state is not None:
            # Crash resume: continue from a load_checkpoint() state. The
            # optimizer transform is rebuilt with the run's original
            # schedule horizon (completed + remaining updates) so the lr
            # anneal continues on the same slope; the restored opt_state
            # carries the schedule step.
            state = jax.tree.map(jnp.asarray, initial_state)
            if getattr(self, "_tx", None) is None:
                self._tx = self._make_optimizer(
                    int(state.update_idx) + n_updates
                )
        else:
            state = self.init_state(jax.random.PRNGKey(seed), n_updates)

        # Cache the jitted step across learn() calls: re-wrapping with
        # jax.jit on every call re-traces and re-lowers the whole
        # rollout+update graph (~15 s for the pixel configurations) even
        # though XLA would hit its executable cache. The trace closes over
        # self._tx, whose lr-anneal horizon is n_updates — so the cache key
        # includes the horizon and init_state only rebuilds the optimizer
        # when the horizon actually changes.
        # Entries hold the optimizer OBJECT and validate by identity (an
        # id()-keyed cache is unsound: CPython reuses freed addresses, so a
        # rebuilt optimizer could alias a stale trace with the wrong lr
        # horizon baked in).
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = self._jit_cache = {}
        entry = cache.get(k)
        if entry is None or entry[0] is not self._tx:
            if k == 1:
                jit_iter = jax.jit(self.train_iteration, donate_argnums=0)
            else:
                def k_updates(state):
                    def body(s, _):
                        s, metrics = self.train_iteration(s)
                        return s, metrics

                    return jax.lax.scan(body, state, None, length=k)

                jit_iter = jax.jit(k_updates, donate_argnums=0)
            entry = (self._tx, jit_iter)
            cache[k] = entry
        jit_iter = entry[1]

        episode_returns = []
        episode_lengths = []
        t_start = time.time()
        num_timesteps = 0
        for update in range(0, n_updates, k):
            state, metrics = jit_iter(state)
            self.state = state
            num_timesteps += steps_per_update * k
            ep_ret = np.asarray(metrics["episode_return"])
            finished = ~np.isnan(ep_ret)
            if finished.any():
                episode_returns.extend(ep_ret[finished].tolist())
                episode_lengths.extend(
                    np.asarray(metrics["episode_length"])[finished].tolist()
                )
            if callback is not None:
                # With k > 1, scalar metrics arrive stacked [k]; expose means.
                cb_metrics = jax.tree.map(
                    lambda x: x if k == 1 else x[-1] if x.ndim == 0 else x,
                    metrics,
                ) if k == 1 else {
                    name: (np.asarray(v).mean() if np.asarray(v).ndim <= 1
                           else np.asarray(v))
                    for name, v in metrics.items()
                }
                callback(
                    {
                        "self": self,
                        "state": state,
                        "update": update + k - 1,
                        "n_updates": n_updates,
                        "num_timesteps": num_timesteps,
                        "episode_returns": episode_returns,
                        "episode_lengths": episode_lengths,
                        "metrics": cb_metrics,
                        "fps": num_timesteps / max(time.time() - t_start, 1e-9),
                    },
                    {},
                )
        self.state = state
        return state

    # ---- BaseRLObject-surface methods ----------------------------------
    def customArguments(self, parser):
        super().customArguments(parser)
        return parser

    @classmethod
    def getOptParam(cls):
        # ppo2.py:24-36
        return {
            "lam": (float, (0, 1)),
            "gamma": (float, (0, 1)),
            "max_grad_norm": (float, (0, 1)),
            "vf_coef": (float, (0, 1)),
            "learning_rate": (float, (1e-2, 1e-5)),
            "ent_coef": (float, (0, 1)),
            "cliprange": (float, (0, 1)),
            "noptepochs": (int, (1, 10)),
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

    # ---- persistence -----------------------------------------------------
    def save(self, save_path: str, _locals=None):
        payload = {
            "name": self.name,
            "config": dataclasses.asdict(self.config),
            "num_envs": self.num_envs,
            "policy_kind": self.policy_kind,
            "normalize_obs": self.normalize_obs,
            "params": self._to_numpy(self.state.params),
            "obs_norm": (
                self._to_numpy(
                    {
                        "mean": self.state.obs_norm.mean,
                        "var": self.state.obs_norm.var,
                        "count": self.state.obs_norm.count,
                    }
                )
                if self.state.obs_norm is not None
                else None
            ),
        }
        self._save_pickle(save_path, payload)

    @classmethod
    def load(cls, load_path: str, env=None, args=None) -> "PPO2":
        d = cls._load_pickle(load_path)
        agent = cls(
            env=env,
            num_envs=d["num_envs"],
            policy=d["policy_kind"],
            config=PPOConfig(**d["config"]),
            normalize_obs=d["normalize_obs"],
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
            params=params,
            opt_state=None,
            vstate=None,
            obs=None,
            obs_norm=obs_norm,
            key=jax.random.PRNGKey(0),
            update_idx=jnp.int32(0),
        )
        return agent
