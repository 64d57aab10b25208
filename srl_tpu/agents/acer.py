"""ACER — actor-critic with experience replay (discrete), on-device.

Replaces stable-baselines ACER as wrapped by rl_baselines/rl_algorithm/acer.py
with its defaults (acer.py:44-69): n_steps=20, replay buffer 5000
transitions, replay ratio 4, q_coef 0.5, ent_coef 0.01, RMSProp lr 7e-4,
Retrace(λ=1) off-policy correction with truncated importance weights (c=10),
bias correction, and the efficient trust-region update against an average
policy network (alpha=0.99, delta=1).

The trust region operates in distribution space exactly like the original:
the policy-loss gradient w.r.t. the logits is projected to limit KL movement
from the average-policy distribution, then pulled back through the network
with a VJP. Rollout segments live in an on-device segment buffer; one train
iteration = on-policy update + `replay_ratio` off-policy updates, all jitted.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from srl_tpu.agents.base import BaseRLAgent
from srl_tpu.core.env import VecEnv
from srl_tpu.core.normalize import RunningNorm
from srl_tpu.models.policies import MlpTorso, NatureCnnTorso, ORTHO_GAIN


@dataclasses.dataclass
class ACERConfig:
    n_steps: int = 20
    buffer_segments: int = 50  # ~5000/(n_steps*envs) transition parity
    replay_ratio: int = 4
    replay_start: int = 4  # segments before off-policy updates begin
    q_coef: float = 0.5
    ent_coef: float = 0.01
    max_grad_norm: float = 10.0
    learning_rate: float = 7e-4
    rprop_alpha: float = 0.99
    rprop_epsilon: float = 1e-5
    gamma: float = 0.99
    correction_term: float = 10.0  # importance weight truncation c
    trust_region: bool = True
    alpha: float = 0.99  # average policy EMA
    delta: float = 1.0  # trust region radius


class ACERNet(nn.Module):
    """pi(a|s) logits + Q(s, .) per action (dueling-free ACER head)."""

    n_actions: int
    torso: str = "mlp"

    @nn.compact
    def __call__(self, x):
        t = MlpTorso() if self.torso == "mlp" else NatureCnnTorso()
        h = t(x)
        dense = lambda f, name: nn.Dense(
            f, kernel_init=nn.initializers.orthogonal(0.01), name=name
        )
        logits = dense(self.n_actions, "pi")(h)
        q = nn.Dense(self.n_actions,
                     kernel_init=nn.initializers.orthogonal(1.0), name="q")(h)
        return logits, q


@struct.dataclass
class SegmentBuffer:
    obs: jax.Array  # [C, T+1, N, ...]
    actions: jax.Array  # [C, T, N]
    rewards: jax.Array  # [C, T, N]
    dones: jax.Array  # [C, T, N]
    mus: jax.Array  # [C, T, N, A] behavior probs
    cursor: jax.Array
    size: jax.Array

    @classmethod
    def create(cls, capacity, n_steps, num_envs, obs_shape, obs_dtype, n_act):
        return cls(
            obs=jnp.zeros((capacity, n_steps + 1, num_envs) + obs_shape, obs_dtype),
            actions=jnp.zeros((capacity, n_steps, num_envs), jnp.int32),
            rewards=jnp.zeros((capacity, n_steps, num_envs), jnp.float32),
            dones=jnp.zeros((capacity, n_steps, num_envs), jnp.bool_),
            mus=jnp.zeros((capacity, n_steps, num_envs, n_act), jnp.float32),
            cursor=jnp.int32(0),
            size=jnp.int32(0),
        )

    def add(self, obs, actions, rewards, dones, mus):
        c = self.cursor
        cap = self.obs.shape[0]
        return self.replace(
            obs=self.obs.at[c].set(obs),
            actions=self.actions.at[c].set(actions),
            rewards=self.rewards.at[c].set(rewards),
            dones=self.dones.at[c].set(dones),
            mus=self.mus.at[c].set(mus),
            cursor=(c + 1) % cap,
            size=jnp.minimum(self.size + 1, cap),
        )


@struct.dataclass
class ACERState:
    params: dict
    avg_params: dict
    opt_state: optax.OptState
    buffer: SegmentBuffer
    vstate: object
    obs: jax.Array
    obs_norm: Optional[RunningNorm]
    key: jax.Array
    update_idx: jax.Array


class ACER(BaseRLAgent):
    name = "acer"

    def __init__(self, env=None, num_envs: int = 8, policy: str = "auto",
                 config: ACERConfig = None, normalize_obs: Optional[bool] = None):
        super().__init__()
        self.env = env
        self.num_envs = num_envs
        self.config = config or ACERConfig()
        self.policy_kind = policy
        if env is not None:
            self.vec_env = VecEnv(env, num_envs)
            self.n_act = env.action_space.n
            torso = "cnn" if (
                policy == "cnn"
                or (policy == "auto" and len(env.observation_space.shape) == 3)
            ) else "mlp"
            self.net = ACERNet(self.n_act, torso)
            if normalize_obs is None:
                normalize_obs = env.srl_model != "raw_pixels"
            self.normalize_obs = normalize_obs
            cfg = self.config
            self._tx = optax.chain(
                optax.clip_by_global_norm(cfg.max_grad_norm),
                optax.rmsprop(cfg.learning_rate, decay=cfg.rprop_alpha,
                              eps=cfg.rprop_epsilon),
            )

    def init_state(self, key) -> ACERState:
        cfg = self.config
        key, k_env, k_p = jax.random.split(key, 3)
        vstate, obs = self.vec_env.reset(k_env)
        params = self.net.init(k_p, obs)
        avg_params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        obs_space = self.env.observation_space
        buffer = SegmentBuffer.create(
            cfg.buffer_segments, cfg.n_steps, self.num_envs,
            obs_space.shape, obs_space.dtype, self.n_act,
        )
        obs_norm = RunningNorm.create(obs_space.shape) if self.normalize_obs else None
        return ACERState(params=params, avg_params=avg_params,
                         opt_state=self._tx.init(params), buffer=buffer,
                         vstate=vstate, obs=obs, obs_norm=obs_norm, key=key,
                         update_idx=jnp.int32(0))

    # ------------------------------------------------------------------
    def _acer_logit_grads(self, logits, q, avg_logits, actions, rewards,
                          dones, mus, T):
        """Distribution-space ACER gradients w.r.t. (logits [T+1,N,A],
        q [T+1,N,A]): Retrace targets, truncated-importance policy gain,
        bias correction, entropy, and the trust-region projection against
        the average-policy distribution. Shared by the feedforward and
        recurrent variants — only the network forward (and hence the VJP
        that pulls these back to parameters) differs."""
        cfg = self.config

        def loss_of_logits(lg, qv):
            f = jax.nn.softmax(lg[:T], axis=-1)  # [T,N,A]
            f_all = jax.nn.softmax(lg, axis=-1)
            q_t = qv[:T]
            v = jnp.sum(f_all * qv, axis=-1)  # [T+1,N]
            f_a = jnp.take_along_axis(f, actions[..., None], -1)[..., 0]
            q_a = jnp.take_along_axis(q_t, actions[..., None], -1)[..., 0]
            mu_a = jnp.take_along_axis(mus, actions[..., None], -1)[..., 0]
            rho = f_a / (mu_a + 1e-6)
            rho_all = f / (mus + 1e-6)
            rho_bar = jnp.minimum(rho, 1.0)

            # Retrace backward recursion (unrolled — T is small and static).
            q_rets = []
            q_ret = v[T] * (1.0 - dones[T - 1].astype(jnp.float32))
            for tstep in reversed(range(T)):
                q_ret = rewards[tstep] + cfg.gamma * q_ret * (
                    1.0 - dones[tstep].astype(jnp.float32)
                )
                q_rets.append(q_ret)
                q_ret = rho_bar[tstep] * (q_ret - q_a[tstep]) + v[tstep]
            q_ret = jnp.stack(q_rets[::-1])  # [T,N]

            adv = q_ret - v[:T]
            logf_a = jnp.log(f_a + 1e-6)
            gain_f = logf_a * jax.lax.stop_gradient(
                adv * jnp.minimum(cfg.correction_term, rho)
            )
            # Bias correction over all actions.
            adv_bc = q_t - v[:T, :, None]
            gain_bc = jnp.sum(
                jnp.log(f + 1e-6)
                * jax.lax.stop_gradient(
                    adv_bc * f
                    * jnp.maximum(0.0, 1.0 - cfg.correction_term / (rho_all + 1e-6))
                ),
                axis=-1,
            )
            loss_policy = -jnp.mean(gain_f + gain_bc)
            entropy = -jnp.mean(jnp.sum(f * jnp.log(f + 1e-6), axis=-1))
            loss_q = 0.5 * jnp.mean(
                jnp.square(jax.lax.stop_gradient(q_ret) - q_a)
            )
            return loss_policy - cfg.ent_coef * entropy, loss_q

        # Gradients w.r.t. logits (policy part) and q (value part).
        (g_logits, _), (_, g_q) = (
            jax.grad(lambda lg, qv: loss_of_logits(lg, qv)[0], argnums=(0, 1))(
                logits, q
            ),
            jax.grad(lambda lg, qv: loss_of_logits(lg, qv)[1], argnums=(0, 1))(
                logits, q
            ),
        )

        if cfg.trust_region:
            # k = grad of KL(avg || pi) wrt logits = pi - avg_pi.
            f = jax.nn.softmax(logits, axis=-1)
            avg_f = jax.nn.softmax(avg_logits, axis=-1)
            k = f - avg_f
            g = -g_logits  # ascent direction on the gain
            kg = jnp.sum(k * g, axis=-1, keepdims=True)
            k2 = jnp.sum(k * k, axis=-1, keepdims=True)
            adj = jnp.maximum(0.0, (kg - cfg.delta) / (k2 + 1e-6))
            g_logits = -(g - adj * k)
        return g_logits, g_q

    def _segment_loss_grads(self, params, avg_params, segment):
        """ACER loss gradients for one segment with distribution-space trust
        region. Returns a grads pytree."""
        cfg = self.config
        obs, actions, rewards, dones, mus = segment  # [T+1,N,...],[T,N],...
        T, N = actions.shape
        flat_obs = obs.reshape((-1,) + obs.shape[2:])

        # Logit-space trust region: split the computation at the logits.
        def net_to_logits(p):
            return self.net.apply(p, flat_obs)

        (logits, q), vjp_fn = jax.vjp(net_to_logits, params)
        logits = logits.reshape(T + 1, N, self.n_act)
        q = q.reshape(T + 1, N, self.n_act)
        avg_logits, _ = self.net.apply(avg_params, flat_obs)
        avg_logits = avg_logits.reshape(T + 1, N, self.n_act)

        g_logits, g_q = self._acer_logit_grads(
            logits, q, avg_logits, actions, rewards, dones, mus, T
        )
        (grads,) = vjp_fn((
            g_logits.reshape(-1, self.n_act),
            (g_q * cfg.q_coef).reshape(-1, self.n_act),
        ))
        return grads

    def train_iteration(self, state: ACERState):
        cfg = self.config
        key, k_roll, k_replay = jax.random.split(state.key, 3)

        # ---- on-policy rollout segment ----
        def body(carry, _):
            vstate, obs, obs_norm, k = carry
            if obs_norm is not None:
                obs_norm = obs_norm.update(obs)
                norm_obs = obs_norm.normalize(obs)
            else:
                norm_obs = obs
            k, ka = jax.random.split(k)
            logits, _ = self.net.apply(state.params, norm_obs)
            mu = jax.nn.softmax(logits, axis=-1)
            action = jax.random.categorical(ka, logits).astype(jnp.int32)
            vstate, tr = self.vec_env.step(vstate, action)
            out = (norm_obs, action, tr.reward, tr.done, mu,
                   tr.episode_return, tr.episode_length)
            return (vstate, tr.obs, obs_norm, k), out

        (vstate, obs, obs_norm, _), (
            seg_obs, seg_act, seg_rew, seg_done, seg_mu, ep_ret, ep_len
        ) = jax.lax.scan(
            body, (state.vstate, state.obs, state.obs_norm, k_roll), None,
            length=cfg.n_steps,
        )
        last_norm = obs_norm.normalize(obs) if obs_norm is not None else obs
        seg_obs_full = jnp.concatenate([seg_obs, last_norm[None]], axis=0)
        buffer = state.buffer.add(seg_obs_full, seg_act, seg_rew, seg_done, seg_mu)

        params, opt_state = state.params, state.opt_state

        def apply_grads(params, opt_state, grads):
            updates, opt_state = self._tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        # On-policy update.
        grads = self._segment_loss_grads(
            params, state.avg_params,
            (seg_obs_full, seg_act, seg_rew, seg_done, seg_mu),
        )
        params, opt_state = apply_grads(params, opt_state, grads)

        # Off-policy replays.
        def replay_update(i, carry):
            params, opt_state, k = carry
            k, ks = jax.random.split(k)
            idx = jax.random.randint(ks, (), 0, jnp.maximum(buffer.size, 1))
            seg = (buffer.obs[idx], buffer.actions[idx], buffer.rewards[idx],
                   buffer.dones[idx], buffer.mus[idx])
            grads = self._segment_loss_grads(params, state.avg_params, seg)
            params, opt_state = apply_grads(params, opt_state, grads)
            return (params, opt_state, k)

        def do_replay(carry):
            return jax.lax.fori_loop(0, cfg.replay_ratio, replay_update, carry)

        params, opt_state, _ = jax.lax.cond(
            buffer.size >= cfg.replay_start, do_replay, lambda c: c,
            (params, opt_state, k_replay),
        )

        avg_params = jax.tree.map(
            lambda a, p: cfg.alpha * a + (1 - cfg.alpha) * p,
            state.avg_params, params,
        )

        metrics = {
            "episode_return": ep_ret,
            "episode_length": ep_len,
            "mean_reward_per_step": jnp.mean(seg_rew),
        }
        new_state = ACERState(
            params=params, avg_params=avg_params, opt_state=opt_state,
            buffer=buffer, vstate=vstate, obs=obs, obs_norm=obs_norm,
            key=key, update_idx=state.update_idx + 1,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    def learn(self, total_timesteps: int, seed: int = 0,
              callback: Optional[Callable] = None) -> ACERState:
        cfg = self.config
        steps_per_update = cfg.n_steps * self.num_envs
        n_updates = max(1, total_timesteps // steps_per_update)
        state = self.init_state(jax.random.PRNGKey(seed))
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
        # acer.py getOptParam surface
        return {
            "n_steps": (int, (1, 100)),
            "q_coef": (float, (0, 1)),
            "ent_coef": (float, (0, 1)),
            "learning_rate": (float, (0, 0.1)),
            "gamma": (float, (0.5, 1)),
            "replay_ratio": (int, (0, 10)),
            "correction_term": (float, (1, 10)),
            "delta": (float, (0.1, 10)),
        }

    def getAction(self, observation, dones=None, deterministic=False, key=None):
        obs = jnp.asarray(observation)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        logits, _ = self.net.apply(self.state.params, obs)
        if deterministic:
            return np.asarray(jnp.argmax(logits, axis=-1))
        if key is None:
            key = self._next_act_key()
        return np.asarray(jax.random.categorical(key, logits))

    def getActionProba(self, observation, dones=None):
        obs = jnp.asarray(observation)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        logits, _ = self.net.apply(self.state.params, obs)
        return np.asarray(jax.nn.softmax(logits, axis=-1))

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
                    config=ACERConfig(**d["config"]),
                    normalize_obs=d["normalize_obs"])
        params = jax.tree.map(jnp.asarray, d["params"])
        obs_norm = None
        if d["obs_norm"] is not None:
            obs_norm = RunningNorm(
                mean=jnp.asarray(d["obs_norm"]["mean"]),
                var=jnp.asarray(d["obs_norm"]["var"]),
                count=jnp.asarray(d["obs_norm"]["count"]),
            )
        agent.state = ACERState(
            params=params, avg_params=params, opt_state=None, buffer=None,
            vstate=None, obs=None, obs_norm=obs_norm,
            key=jax.random.PRNGKey(0), update_idx=jnp.int32(0),
        )
        return agent


# ---------------------------------------------------------------------------
# Recurrent (lstm/lnlstm/cnnlstm) variant
# ---------------------------------------------------------------------------


class LstmACERNet(nn.Module):
    """torso -> LSTM -> (pi logits, Q per action), one timestep.

    The reference routes recurrent stable-baselines policies to ACER through
    the shared policy selector (base_classes.py:227-246); stable-baselines'
    recurrent ACER re-runs the LSTM over each stored segment from its
    initial hidden state, which is the semantics replayed here."""

    n_actions: int
    torso: str = "mlp"
    n_lstm: int = 64
    layer_norm: bool = False

    def setup(self):
        self.features = MlpTorso() if self.torso == "mlp" else NatureCnnTorso()
        self.cell = nn.OptimizedLSTMCell(self.n_lstm)
        if self.layer_norm:
            self.ln = nn.LayerNorm()
        self.pi = nn.Dense(
            self.n_actions, kernel_init=nn.initializers.orthogonal(0.01),
            name="pi",
        )
        self.q = nn.Dense(
            self.n_actions, kernel_init=nn.initializers.orthogonal(1.0),
            name="q",
        )

    def __call__(self, obs, lstm_state, done):
        """obs [N, ...], lstm_state ((N,H),(N,H)), done [N] = episode ended
        BEFORE this observation (hidden state is zeroed across episode
        boundaries, matching stable-baselines' mask semantics)."""
        x = self.features(obs)
        mask = (1.0 - done.astype(jnp.float32))[:, None]
        lstm_state = (lstm_state[0] * mask, lstm_state[1] * mask)
        lstm_state, h = self.cell(lstm_state, x)
        if self.layer_norm:
            h = self.ln(h)
        return self.pi(h), self.q(h), lstm_state


@struct.dataclass
class RecurrentSegmentBuffer:
    """SegmentBuffer plus what a BPTT replay needs: the segment's initial
    LSTM state and the done-before-step mask for every evaluation."""

    obs: jax.Array  # [C, T+1, N, ...]
    actions: jax.Array  # [C, T, N]
    rewards: jax.Array  # [C, T, N]
    dones: jax.Array  # [C, T, N] done AFTER each step (Retrace masks)
    dones_in: jax.Array  # [C, T+1, N] done BEFORE each evaluation (LSTM masks)
    mus: jax.Array  # [C, T, N, A]
    lstm_c: jax.Array  # [C, N, H]
    lstm_h: jax.Array  # [C, N, H]
    cursor: jax.Array
    size: jax.Array

    @classmethod
    def create(cls, capacity, n_steps, num_envs, obs_shape, obs_dtype, n_act,
               n_lstm):
        return cls(
            obs=jnp.zeros((capacity, n_steps + 1, num_envs) + obs_shape, obs_dtype),
            actions=jnp.zeros((capacity, n_steps, num_envs), jnp.int32),
            rewards=jnp.zeros((capacity, n_steps, num_envs), jnp.float32),
            dones=jnp.zeros((capacity, n_steps, num_envs), jnp.bool_),
            dones_in=jnp.zeros((capacity, n_steps + 1, num_envs), jnp.bool_),
            mus=jnp.zeros((capacity, n_steps, num_envs, n_act), jnp.float32),
            lstm_c=jnp.zeros((capacity, num_envs, n_lstm), jnp.float32),
            lstm_h=jnp.zeros((capacity, num_envs, n_lstm), jnp.float32),
            cursor=jnp.int32(0),
            size=jnp.int32(0),
        )

    def add(self, obs, actions, rewards, dones, dones_in, mus, lstm0):
        c = self.cursor
        cap = self.obs.shape[0]
        return self.replace(
            obs=self.obs.at[c].set(obs),
            actions=self.actions.at[c].set(actions),
            rewards=self.rewards.at[c].set(rewards),
            dones=self.dones.at[c].set(dones),
            dones_in=self.dones_in.at[c].set(dones_in),
            mus=self.mus.at[c].set(mus),
            lstm_c=self.lstm_c.at[c].set(lstm0[0]),
            lstm_h=self.lstm_h.at[c].set(lstm0[1]),
            cursor=(c + 1) % cap,
            size=jnp.minimum(self.size + 1, cap),
        )


@struct.dataclass
class RecurrentACERState:
    params: dict
    avg_params: dict
    opt_state: optax.OptState
    buffer: RecurrentSegmentBuffer
    vstate: object
    obs: jax.Array
    done: jax.Array  # [N] episode-start mask for the next evaluation
    lstm_state: tuple
    obs_norm: Optional[RunningNorm]
    key: jax.Array
    update_idx: jax.Array


class RecurrentACER(ACER):
    """ACER with an lstm/lnlstm/cnnlstm policy (truncated BPTT over each
    n_steps segment; the off-policy replay re-runs the LSTM from the
    segment's stored initial hidden state with the *current* params, as
    stable-baselines' recurrent ACER does)."""

    def __init__(self, env=None, num_envs: int = 8, policy: str = "lstm",
                 config: ACERConfig = None, normalize_obs: Optional[bool] = None):
        BaseRLAgent.__init__(self)
        self.env = env
        self.num_envs = num_envs
        self.config = config or ACERConfig()
        self.policy_kind = policy
        if env is not None:
            self.vec_env = VecEnv(env, num_envs)
            self.n_act = env.action_space.n
            torso = "cnn" if policy.startswith("cnn") else "mlp"
            self.net = LstmACERNet(
                self.n_act, torso, layer_norm="lnlstm" in policy
            )
            if normalize_obs is None:
                normalize_obs = env.srl_model != "raw_pixels"
            self.normalize_obs = normalize_obs
            cfg = self.config
            self._tx = optax.chain(
                optax.clip_by_global_norm(cfg.max_grad_norm),
                optax.rmsprop(cfg.learning_rate, decay=cfg.rprop_alpha,
                              eps=cfg.rprop_epsilon),
            )

    def init_state(self, key) -> RecurrentACERState:
        cfg = self.config
        key, k_env, k_p = jax.random.split(key, 3)
        vstate, obs = self.vec_env.reset(k_env)
        done0 = jnp.zeros(self.num_envs, bool)
        lstm0 = (jnp.zeros((self.num_envs, self.net.n_lstm)),
                 jnp.zeros((self.num_envs, self.net.n_lstm)))
        params = self.net.init(k_p, obs, lstm0, done0)
        avg_params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        obs_space = self.env.observation_space
        buffer = RecurrentSegmentBuffer.create(
            cfg.buffer_segments, cfg.n_steps, self.num_envs,
            obs_space.shape, obs_space.dtype, self.n_act, self.net.n_lstm,
        )
        obs_norm = RunningNorm.create(obs_space.shape) if self.normalize_obs else None
        return RecurrentACERState(
            params=params, avg_params=avg_params,
            opt_state=self._tx.init(params), buffer=buffer, vstate=vstate,
            obs=obs, done=done0, lstm_state=lstm0, obs_norm=obs_norm,
            key=key, update_idx=jnp.int32(0),
        )

    def _scan_forward(self, params, obs_seq, dones_in, lstm0):
        """Run the LSTM net over a [T+1, N, ...] segment from lstm0;
        returns (logits, q) each [T+1, N, A]. Gradients flow through time."""

        def step(lstm, inp):
            o, d = inp
            logits, q, lstm = self.net.apply(params, o, lstm, d)
            return lstm, (logits, q)

        _, (logits, q) = jax.lax.scan(step, lstm0, (obs_seq, dones_in))
        return logits, q

    def _segment_loss_grads(self, params, avg_params, segment):
        """Same ACER loss/trust-region as the feedforward variant, with the
        flat forward replaced by a BPTT scan from the stored initial state.
        segment = (obs [T+1,N,..], actions, rewards, dones, dones_in
        [T+1,N], mus, lstm0)."""
        cfg = self.config
        obs, actions, rewards, dones, dones_in, mus, lstm0 = segment
        T, N = actions.shape

        def net_to_logits(p):
            return self._scan_forward(p, obs, dones_in, lstm0)

        (logits, q), vjp_fn = jax.vjp(net_to_logits, params)
        avg_logits, _ = self._scan_forward(avg_params, obs, dones_in, lstm0)

        g_logits, g_q = self._acer_logit_grads(
            logits, q, avg_logits, actions, rewards, dones, mus, T
        )
        (grads,) = vjp_fn((g_logits, g_q * cfg.q_coef))
        return grads

    def train_iteration(self, state: RecurrentACERState):
        cfg = self.config
        key, k_roll, k_replay = jax.random.split(state.key, 3)
        lstm0 = state.lstm_state

        def body(carry, k_step):
            vstate, obs, done, lstm, obs_norm = carry
            if obs_norm is not None:
                obs_norm = obs_norm.update(obs)
                norm_obs = obs_norm.normalize(obs)
            else:
                norm_obs = obs
            logits, _, new_lstm = self.net.apply(
                state.params, norm_obs, lstm, done
            )
            mu = jax.nn.softmax(logits, axis=-1)
            action = jax.random.categorical(k_step, logits).astype(jnp.int32)
            vstate, tr = self.vec_env.step(vstate, action)
            out = (norm_obs, done, action, tr.reward, tr.done, mu,
                   tr.episode_return, tr.episode_length)
            return (vstate, tr.obs, tr.done, new_lstm, obs_norm), out

        step_keys = jax.random.split(k_roll, cfg.n_steps)
        (vstate, obs, done, lstm_state, obs_norm), (
            seg_obs, seg_done_in, seg_act, seg_rew, seg_done, seg_mu,
            ep_ret, ep_len,
        ) = jax.lax.scan(
            body,
            (state.vstate, state.obs, state.done, lstm0, state.obs_norm),
            step_keys,
        )
        last_norm = obs_norm.normalize(obs) if obs_norm is not None else obs
        seg_obs_full = jnp.concatenate([seg_obs, last_norm[None]], axis=0)
        dones_in_full = jnp.concatenate([seg_done_in, done[None]], axis=0)
        buffer = state.buffer.add(
            seg_obs_full, seg_act, seg_rew, seg_done, dones_in_full, seg_mu,
            lstm0,
        )

        params, opt_state = state.params, state.opt_state

        def apply_grads(params, opt_state, grads):
            updates, opt_state = self._tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        grads = self._segment_loss_grads(
            params, state.avg_params,
            (seg_obs_full, seg_act, seg_rew, seg_done, dones_in_full, seg_mu,
             lstm0),
        )
        params, opt_state = apply_grads(params, opt_state, grads)

        def replay_update(i, carry):
            params, opt_state, k = carry
            k, ks = jax.random.split(k)
            idx = jax.random.randint(ks, (), 0, jnp.maximum(buffer.size, 1))
            seg = (buffer.obs[idx], buffer.actions[idx], buffer.rewards[idx],
                   buffer.dones[idx], buffer.dones_in[idx], buffer.mus[idx],
                   (buffer.lstm_c[idx], buffer.lstm_h[idx]))
            grads = self._segment_loss_grads(params, state.avg_params, seg)
            params, opt_state = apply_grads(params, opt_state, grads)
            return (params, opt_state, k)

        params, opt_state, _ = jax.lax.cond(
            buffer.size >= cfg.replay_start,
            lambda c: jax.lax.fori_loop(0, cfg.replay_ratio, replay_update, c),
            lambda c: c,
            (params, opt_state, k_replay),
        )

        avg_params = jax.tree.map(
            lambda a, p: cfg.alpha * a + (1 - cfg.alpha) * p,
            state.avg_params, params,
        )
        metrics = {
            "episode_return": ep_ret,
            "episode_length": ep_len,
            "mean_reward_per_step": jnp.mean(seg_rew),
        }
        new_state = RecurrentACERState(
            params=params, avg_params=avg_params, opt_state=opt_state,
            buffer=buffer, vstate=vstate, obs=obs, done=done,
            lstm_state=lstm_state, obs_norm=obs_norm, key=key,
            update_idx=state.update_idx + 1,
        )
        return new_state, metrics

    # ---- acting (stateful LSTM, as RecurrentPPO2) ------------------------
    def getAction(self, observation, dones=None, deterministic=False, key=None):
        obs = jnp.asarray(observation)
        n = obs.shape[0]
        if not hasattr(self, "_act_lstm") or self._act_lstm[0].shape[0] != n:
            self._act_lstm = (jnp.zeros((n, self.net.n_lstm)),
                              jnp.zeros((n, self.net.n_lstm)))
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        done = (jnp.zeros(n, bool) if dones is None
                else jnp.asarray(dones, bool))
        # Pre-advance context so getActionProba can report the distribution
        # this call actually acted from (not a zeroed-state one).
        self._act_ctx = (self._act_lstm, done)
        logits, _, self._act_lstm = self.net.apply(
            self.state.params, obs, self._act_lstm, done
        )
        if deterministic:
            return np.asarray(jnp.argmax(logits, axis=-1))
        if key is None:
            key = self._next_act_key()
        return np.asarray(jax.random.categorical(key, logits))

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
            lstm = (jnp.zeros((n, self.net.n_lstm)),
                    jnp.zeros((n, self.net.n_lstm)))
            done = jnp.zeros(n, bool)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        logits, _, _ = self.net.apply(
            self.state.params, obs, lstm, done
        )
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    def save(self, save_path, _locals=None):
        self._save_pickle(
            save_path,
            {"name": "acer_lstm", "config": dataclasses.asdict(self.config),
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
                    config=ACERConfig(**d["config"]),
                    normalize_obs=d["normalize_obs"])
        params = jax.tree.map(jnp.asarray, d["params"])
        obs_norm = None
        if d["obs_norm"] is not None:
            obs_norm = RunningNorm(
                mean=jnp.asarray(d["obs_norm"]["mean"]),
                var=jnp.asarray(d["obs_norm"]["var"]),
                count=jnp.asarray(d["obs_norm"]["count"]),
            )
        agent.state = RecurrentACERState(
            params=params, avg_params=params, opt_state=None, buffer=None,
            vstate=None, obs=None, done=None, lstm_state=None,
            obs_norm=obs_norm, key=jax.random.PRNGKey(0),
            update_idx=jnp.int32(0),
        )
        return agent
