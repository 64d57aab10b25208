"""ACKTR — actor-critic with Kronecker-factored natural gradient (K-FAC).

Replaces stable-baselines ACKTR as wrapped by rl_baselines/rl_algorithm/acktr.py
(discrete actions; the reference warns about raw_pixels memory,
acktr.py:42-43). Defaults follow stable-baselines: n_steps=20, lr 0.25 with
momentum 0.9, vf_coef 0.25, ent_coef 0.01, gamma 0.99, kfac_clip 0.001.

The policy is written explicitly (no Flax) so every layer's input
activations `a` are available: K-FAC maintains EMA Kronecker factors
A = E[a aᵀ] (bias-augmented) and G per layer and preconditions the gradient
as (A+λI)⁻¹ dW (G+λI)⁻¹, with a trust-region rescale from the preconditioned
gradient norm (the kl_clip rule). Two policy torsos:

- ``mlp``: two 64-unit tanh layers; all factors are ≤65² and the whole
  update stays inside one jitted step.
- ``cnn`` (auto-selected for image observations): Nature-CNN convs
  (32x8s4, 64x4s2, 64x3s1, bfloat16 on the MXU) + 4x4 avg-pool + fc512.
  Conv layers use the KFC approximation (Grosse & Martens): A is the
  covariance of bias-augmented im2col patches
  (``lax.conv_general_dilated_patches``, channel order cin,kh,kw) over a
  subsample of the batch; the kernel gradient is flattened in the same
  order. The avg-pool bounds the fc factor at (6·6·64+1)² for 224x224
  inputs so every inverse stays MXU-sized.

For both torsos G is the true-Fisher output-gradient covariance E[g gᵀ],
estimated on a batch subsample: targets are sampled from the model's own
predictive distributions (actions from the categorical policy, value targets
v+ε with unit Gaussian ε) and each layer's per-sample pre-activation
gradient is read off as the per-sample gradient of its bias
(``vmap(grad(...))`` — one extra batched backward pass per update; for conv
layers this sums g over spatial locations, the standard KFC "gradient"
flavor). The kl_clip trust-region rescale absorbs residual scale error.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from srl_tpu.agents.base import BaseRLAgent
from srl_tpu.agents.common import compute_gae
from srl_tpu.core.env import VecEnv
from srl_tpu.core.normalize import RunningNorm


@dataclasses.dataclass
class ACKTRConfig:
    n_steps: int = 20
    # The reference harness runs ACKTR at 7e-4 (rl_algorithm/acktr.py:51),
    # not stable-baselines' raw 0.25 — the trust region then only has to
    # guard occasional curvature spikes.
    learning_rate: float = 7e-4
    lr_schedule: str = "constant"
    momentum: float = 0.9
    vf_coef: float = 0.25
    ent_coef: float = 0.01
    gamma: float = 0.99
    kl_clip: float = 0.001
    damping: float = 0.01
    stat_decay: float = 0.95
    max_grad_norm: float = 0.5
    hidden: int = 64
    n_lstm: int = 64  # recurrent-policy hidden size (RecurrentACKTR)
    kfac_obs_samples: int = 32  # batch subsample for conv patch covariances


@struct.dataclass
class ACKTRState:
    params: dict  # {"W1","b1","W2","b2","Wpi","bpi","Wv","bv"}
    momentum: dict
    kfac_A: dict  # per-layer input-covariance factors
    kfac_G: dict  # per-layer grad-covariance factors
    vstate: object
    obs: jax.Array
    obs_norm: Optional[RunningNorm]
    key: jax.Array
    update_idx: jax.Array


class ACKTR(BaseRLAgent):
    name = "acktr"

    def __init__(self, env=None, num_envs: int = 8, policy: str = "auto",
                 config: ACKTRConfig = None, normalize_obs: Optional[bool] = None):
        super().__init__()
        self.env = env
        self.num_envs = num_envs
        self.config = config or ACKTRConfig()
        self.policy_kind = policy
        self.is_cnn = policy == "cnn"
        if env is not None:
            self.vec_env = VecEnv(env, num_envs)
            self.n_act = env.action_space.n
            obs_shape = env.observation_space.shape
            self.obs_dim = int(np.prod(obs_shape))
            self.is_cnn = policy == "cnn" or (
                policy == "auto" and len(obs_shape) == 3
            )
            if self.is_cnn:
                self._cnn_geometry(obs_shape)
            if normalize_obs is None:
                normalize_obs = (
                    env.srl_model != "raw_pixels" and not self.is_cnn
                )
            self.normalize_obs = normalize_obs

    def _cnn_geometry(self, obs_shape):
        """Static conv/pool output shapes (all shapes must be known at
        trace time for the jitted update)."""
        H, W, C = obs_shape
        self.cnn_in_channels = C
        o = lambda d, k, s: (d - k) // s + 1
        h1, w1 = o(H, 8, 4), o(W, 8, 4)
        h2, w2 = o(h1, 4, 2), o(w1, 4, 2)
        h3, w3 = o(h2, 3, 1), o(w2, 3, 1)
        self.pool = max(1, min(4, h3, w3))
        ph, pw = h3 // self.pool, w3 // self.pool
        self.cnn_flat_dim = ph * pw * 64

    # ---- explicit policies ----------------------------------------------
    def _layer_specs(self):
        """(weight, bias, kind, conv geometry) for every K-FAC'd layer."""
        if self.is_cnn:
            return [
                ("C1", "cb1", "conv", {"k": 8, "s": 4}),
                ("C2", "cb2", "conv", {"k": 4, "s": 2}),
                ("C3", "cb3", "conv", {"k": 3, "s": 1}),
                ("Wfc", "bfc", "dense", {}),
                ("Wpi", "bpi", "dense", {}),
                ("Wv", "bv", "dense", {}),
            ]
        return [
            ("W1", "b1", "dense", {}),
            ("W2", "b2", "dense", {}),
            ("Wpi", "bpi", "dense", {}),
            ("Wv", "bv", "dense", {}),
        ]

    def _init_params(self, key):
        h = self.config.hidden
        ortho = jax.nn.initializers.orthogonal(np.sqrt(2))
        if self.is_cnn:
            k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
            C = self.cnn_in_channels
            return {
                "C1": ortho(k1, (8, 8, C, 32)),
                "cb1": jnp.zeros(32),
                "C2": ortho(k2, (4, 4, 32, 64)),
                "cb2": jnp.zeros(64),
                "C3": ortho(k3, (3, 3, 64, 64)),
                "cb3": jnp.zeros(64),
                "Wfc": ortho(k4, (self.cnn_flat_dim, 512)),
                "bfc": jnp.zeros(512),
                "Wpi": jax.nn.initializers.orthogonal(0.01)(
                    k5, (512, self.n_act)),
                "bpi": jnp.zeros(self.n_act),
                "Wv": jax.nn.initializers.orthogonal(1.0)(k6, (512, 1)),
                "bv": jnp.zeros(1),
            }
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "W1": ortho(k1, (self.obs_dim, h)),
            "b1": jnp.zeros(h),
            "W2": ortho(k2, (h, h)),
            "b2": jnp.zeros(h),
            "Wpi": jax.nn.initializers.orthogonal(0.01)(k3, (h, self.n_act)),
            "bpi": jnp.zeros(self.n_act),
            "Wv": jax.nn.initializers.orthogonal(1.0)(k4, (h, 1)),
            "bv": jnp.zeros(1),
        }

    @staticmethod
    def _conv(x, W, stride):
        return jax.lax.conv_general_dilated(
            x, W.astype(x.dtype), (stride, stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def _cnn_features(self, params, x):
        """Conv stack + avg-pool + flatten; returns (flat, conv acts)."""
        x = x.astype(jnp.float32) / 255.0
        xb = x.astype(jnp.bfloat16)
        h1 = jax.nn.relu(self._conv(xb, params["C1"], 4)
                         + params["cb1"].astype(jnp.bfloat16))
        h2 = jax.nn.relu(self._conv(h1, params["C2"], 2)
                         + params["cb2"].astype(jnp.bfloat16))
        h3 = jax.nn.relu(self._conv(h2, params["C3"], 1)
                         + params["cb3"].astype(jnp.bfloat16))
        p = self.pool
        pooled = jax.lax.reduce_window(
            h3.astype(jnp.float32), 0.0, jax.lax.add,
            (1, p, p, 1), (1, p, p, 1), "VALID",
        ) / (p * p)
        flat = pooled.reshape(pooled.shape[0], -1)
        acts = {"C1": x, "C2": h1.astype(jnp.float32),
                "C3": h2.astype(jnp.float32), "Wfc": flat}
        return flat, acts

    def _forward_cnn(self, params, x):
        flat, acts = self._cnn_features(params, x)
        latent = jax.nn.relu(flat @ params["Wfc"] + params["bfc"])
        logits = latent @ params["Wpi"] + params["bpi"]
        value = (latent @ params["Wv"] + params["bv"])[..., 0]
        acts.update({"Wpi": latent, "Wv": latent})
        return logits, value, acts

    def _fisher_G(self, params, obs_sub, key):
        """True-Fisher G per layer: E[g gᵀ] over a batch subsample, with
        targets sampled from the model's own distributions. The per-sample
        pre-activation gradient of layer ℓ is exactly the per-sample
        gradient of its bias (summed over spatial locations for convs)."""
        logits, value, _ = self._forward(params, obs_sub)
        k1, k2 = jax.random.split(key)
        a_samp = jax.random.categorical(k1, logits)
        v_noise = jax.random.normal(k2, value.shape)
        bias_names = [b for _, b, _, _ in self._layer_specs()]
        bias_params = {b: params[b] for b in bias_names}

        def per_sample_loss(bp, x1, a1, n1):
            p = {**params, **bp}
            lg, v, _ = self._forward(p, x1[None])
            lp = jax.nn.log_softmax(lg)[0, a1]
            vf = 0.5 * jnp.square(v[0] - jax.lax.stop_gradient(v[0] + n1))
            return -lp + vf

        g = jax.vmap(jax.grad(per_sample_loss), in_axes=(None, 0, 0, 0))(
            bias_params, obs_sub, a_samp, v_noise
        )
        n = obs_sub.shape[0]
        return {b: g[b].T @ g[b] / n for b in bias_names}

    def _forward(self, params, x):
        """Returns (logits, value, per-layer input activations)."""
        if self.is_cnn:
            return self._forward_cnn(params, x)
        x = x.reshape(x.shape[0], -1)
        z1 = x @ params["W1"] + params["b1"]
        a1 = jnp.tanh(z1)
        z2 = a1 @ params["W2"] + params["b2"]
        a2 = jnp.tanh(z2)
        logits = a2 @ params["Wpi"] + params["bpi"]
        value = (a2 @ params["Wv"] + params["bv"])[..., 0]
        acts = {"W1": x, "W2": a1, "Wpi": a2, "Wv": a2}
        return logits, value, acts

    # ------------------------------------------------------------------
    def train_iteration(self, state: ACKTRState, progress=0.0):
        cfg = self.config

        def rollout_body(carry, _):
            vstate, obs, obs_norm, k = carry
            if obs_norm is not None:
                obs_norm = obs_norm.update(obs)
                norm_obs = obs_norm.normalize(obs)
            else:
                norm_obs = obs
            k, ka = jax.random.split(k)
            logits, value, _ = self._forward(state.params, norm_obs)
            action = jax.random.categorical(ka, logits).astype(jnp.int32)
            logp = jax.nn.log_softmax(logits)[jnp.arange(self.num_envs), action]
            vstate, tr = self.vec_env.step(vstate, action)
            out = (norm_obs, action, value, tr.reward, tr.done,
                   tr.episode_return, tr.episode_length)
            return (vstate, tr.obs, obs_norm, k), out

        key, k_roll, k_fisher = jax.random.split(state.key, 3)
        (vstate, obs, obs_norm, _), (
            b_obs, b_act, b_val, b_rew, b_done, ep_ret, ep_len
        ) = jax.lax.scan(
            rollout_body, (state.vstate, state.obs, state.obs_norm, k_roll),
            None, length=cfg.n_steps,
        )
        last_norm = obs_norm.normalize(obs) if obs_norm is not None else obs
        _, last_value, _ = self._forward(state.params, last_norm)
        advantages, returns = compute_gae(
            b_rew, b_val, b_done, last_value, cfg.gamma, 1.0
        )

        T, N = cfg.n_steps, self.num_envs
        flat_obs = b_obs.reshape((T * N,) + b_obs.shape[2:])
        flat_act = b_act.reshape(-1)
        flat_adv = advantages.reshape(-1)
        flat_ret = returns.reshape(-1)

        def loss_fn(params):
            logits, value, acts = self._forward(params, flat_obs)
            logp_all = jax.nn.log_softmax(logits)
            logp = jnp.take_along_axis(logp_all, flat_act[:, None], 1)[:, 0]
            pg = -jnp.mean(jax.lax.stop_gradient(flat_adv) * logp)
            vf = jnp.mean(jnp.square(value - flat_ret))
            ent = -jnp.mean(jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1))
            return pg + cfg.vf_coef * vf - cfg.ent_coef * ent, acts

        (loss, acts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                             for g in jax.tree.leaves(grads)))
        clip = jnp.minimum(1.0, cfg.max_grad_norm / (gnorm + 1e-8))
        grads = jax.tree.map(lambda g: g * clip, grads)

        fisher_G = self._fisher_G(
            state.params, flat_obs[: cfg.kfac_obs_samples], k_fisher
        )

        params, momentum, kfac_A, kfac_G, eta = self._kfac_apply(
            state, grads, acts, fisher_G, progress
        )

        metrics = {
            "loss": loss,
            "eta": eta,
            "episode_return": ep_ret,
            "episode_length": ep_len,
            "mean_reward_per_step": jnp.mean(b_rew),
        }
        new_state = ACKTRState(
            params=params, momentum=momentum, kfac_A=kfac_A, kfac_G=kfac_G,
            vstate=vstate, obs=obs, obs_norm=obs_norm, key=key,
            update_idx=state.update_idx + 1,
        )
        return new_state, metrics

    def _kfac_apply(self, state, grads, acts, fisher_G, progress):
        """K-FAC factor EMA update + preconditioning + trust-region step.

        ``acts`` maps each weight name to its input activations (2-D
        [rows, in_dim], except conv layers which pass the 4-D feature map
        for patch extraction). Returns (params, momentum, A, G, eta)."""
        cfg = self.config

        def aug(a):  # bias-augmented activations
            return jnp.concatenate([a, jnp.ones((a.shape[0], 1))], axis=1)

        kfac_A, kfac_G = {}, {}
        precond = dict(grads)
        for wname, bname, kind, geom in self._layer_specs():
            if kind == "conv":
                # KFC: A over im2col patches (channel order cin,kh,kw — the
                # conv_general_dilated_patches layout) of a batch subsample.
                sub = acts[wname][: cfg.kfac_obs_samples]
                patches = jax.lax.conv_general_dilated_patches(
                    sub, (geom["k"], geom["k"]), (geom["s"], geom["s"]),
                    "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                a2d = patches.reshape(-1, patches.shape[-1])
                kh, kw, cin, cout = grads[wname].shape
                dW_k = grads[wname].transpose(2, 0, 1, 3).reshape(-1, cout)
            else:
                a2d = acts[wname]
                dW_k = grads[wname]
            a = aug(a2d)  # [rows, in+1]
            A_new = a.T @ a / a.shape[0]
            dW = jnp.concatenate([dW_k, grads[bname][None, :]], axis=0)
            G_new = fisher_G[bname]

            A = cfg.stat_decay * state.kfac_A[wname] + (1 - cfg.stat_decay) * A_new
            G = cfg.stat_decay * state.kfac_G[wname] + (1 - cfg.stat_decay) * G_new
            kfac_A[wname], kfac_G[wname] = A, G
            # Zero-init EMA + bias correction: the factors are unbiased
            # covariance estimates from the very first update (identity init
            # would make early "natural" steps just plain gradients at lr).
            corr = 1.0 - cfg.stat_decay ** (state.update_idx + 1).astype(
                jnp.float32
            )
            A, G = A / corr, G / corr

            pi = jnp.sqrt(
                (jnp.trace(A) / A.shape[0]) / (jnp.trace(G) / G.shape[0] + 1e-8)
                + 1e-8
            )
            A_inv = jnp.linalg.inv(
                A + pi * jnp.sqrt(cfg.damping) * jnp.eye(A.shape[0])
            )
            G_inv = jnp.linalg.inv(
                G + jnp.sqrt(cfg.damping) / pi * jnp.eye(G.shape[0])
            )
            nat = A_inv @ dW @ G_inv  # [in+1, out]
            if kind == "conv":
                precond[wname] = (
                    nat[:-1].reshape(cin, kh, kw, cout).transpose(1, 2, 0, 3)
                )
            else:
                precond[wname] = nat[:-1]
            precond[bname] = nat[-1]

        # Trust-region rescale (kl_clip rule): eta = min(lr,
        # sqrt(2*kl_clip / (gᵀ F⁻¹ g))).
        dot = sum(
            jnp.sum(precond[k] * grads[k]) for k in grads
        )
        lr_now = cfg.learning_rate
        if cfg.lr_schedule == "linear":
            lr_now = cfg.learning_rate * (1.0 - progress)
        eta = jnp.minimum(
            lr_now, jnp.sqrt(2 * cfg.kl_clip / (jnp.abs(dot) + 1e-8))
        )

        momentum = jax.tree.map(
            lambda m, p: cfg.momentum * m + p, state.momentum, precond
        )
        params = jax.tree.map(lambda p, m: p - eta * m, state.params, momentum)
        return params, momentum, kfac_A, kfac_G, eta

    # ------------------------------------------------------------------
    def init_state(self, key) -> ACKTRState:
        cfg = self.config
        key, k_env, k_p = jax.random.split(key, 3)
        vstate, obs = self.vec_env.reset(k_env)
        params = self._init_params(k_p)
        kfac_A, kfac_G = {}, {}
        for wname, _, kind, _ in self._layer_specs():
            w = params[wname]
            if kind == "conv":
                kh, kw, cin, cout = w.shape
                in_dim, out_dim = kh * kw * cin, cout
            else:
                in_dim, out_dim = w.shape
            kfac_A[wname] = jnp.zeros((in_dim + 1, in_dim + 1))
            kfac_G[wname] = jnp.zeros((out_dim, out_dim))
        momentum = jax.tree.map(jnp.zeros_like, params)
        obs_norm = (
            RunningNorm.create(self.env.observation_space.shape)
            if self.normalize_obs else None
        )
        return ACKTRState(params=params, momentum=momentum, kfac_A=kfac_A,
                          kfac_G=kfac_G, vstate=vstate, obs=obs,
                          obs_norm=obs_norm, key=key, update_idx=jnp.int32(0))

    def learn(self, total_timesteps: int, seed: int = 0,
              callback: Optional[Callable] = None) -> ACKTRState:
        cfg = self.config
        steps_per_update = cfg.n_steps * self.num_envs
        n_updates = max(1, total_timesteps // steps_per_update)
        state = self.init_state(jax.random.PRNGKey(seed))
        jit_iter = self._jit_train_iteration()
        episode_returns, episode_lengths = [], []
        t0 = time.time()
        for update in range(n_updates):
            state, metrics = jit_iter(state, jnp.float32(update / n_updates))
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
            "n_steps": (int, (1, 100)),
            "vf_coef": (float, (0, 1)),
            "ent_coef": (float, (0, 1)),
            "learning_rate": (float, (0, 1)),
            "gamma": (float, (0.5, 1)),
            "kl_clip": (float, (1e-4, 1e-2)),
        }

    def getAction(self, observation, dones=None, deterministic=False, key=None):
        obs = jnp.asarray(observation)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        logits, _, _ = self._forward(self.state.params, obs)
        if deterministic:
            return np.asarray(jnp.argmax(logits, axis=-1))
        if key is None:
            key = self._next_act_key()
        return np.asarray(jax.random.categorical(key, logits))

    def getActionProba(self, observation, dones=None):
        obs = jnp.asarray(observation)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        logits, _, _ = self._forward(self.state.params, obs)
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    def save(self, save_path, _locals=None):
        self._save_pickle(
            save_path,
            {"name": self.name, "config": dataclasses.asdict(self.config),
             "num_envs": self.num_envs,
             "policy_kind": "cnn" if self.is_cnn else "mlp",
             "cnn_geom": (
                 {"pool": self.pool, "flat": self.cnn_flat_dim,
                  "channels": self.cnn_in_channels}
                 if self.is_cnn else None),
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
                    config=ACKTRConfig(**d["config"]),
                    normalize_obs=d["normalize_obs"])
        if d.get("cnn_geom") and not hasattr(agent, "pool"):
            agent.pool = d["cnn_geom"]["pool"]
            agent.cnn_flat_dim = d["cnn_geom"]["flat"]
            agent.cnn_in_channels = d["cnn_geom"]["channels"]
        obs_norm = None
        if d["obs_norm"] is not None:
            obs_norm = RunningNorm(
                mean=jnp.asarray(d["obs_norm"]["mean"]),
                var=jnp.asarray(d["obs_norm"]["var"]),
                count=jnp.asarray(d["obs_norm"]["count"]),
            )
        agent.state = ACKTRState(
            params=jax.tree.map(jnp.asarray, d["params"]), momentum=None,
            kfac_A=None, kfac_G=None, vstate=None, obs=None,
            obs_norm=obs_norm, key=jax.random.PRNGKey(0),
            update_idx=jnp.int32(0),
        )
        return agent


@struct.dataclass
class RecurrentACKTRState:
    params: dict
    momentum: dict
    kfac_A: dict
    kfac_G: dict
    vstate: object
    obs: jax.Array
    done: jax.Array
    lstm_state: tuple
    obs_norm: Optional[RunningNorm]
    key: jax.Array
    update_idx: jax.Array


class RecurrentACKTR(ACKTR):
    """ACKTR with an lstm/lnlstm/cnnlstm policy.

    The reference's policy selector hands recurrent stable-baselines
    policies to ACKTR like any other actor-critic algo
    (base_classes.py:227-246; SB2 ACKTR accepts LstmPolicy). Torso
    (mlp tanh | Nature-CNN) -> LSTM (forget-bias 1.0, hidden zeroed at
    episode boundaries) -> pi/vf heads, with truncated BPTT over the
    n_steps segment (the update re-runs the LSTM from the stored initial
    hidden state, as stable-baselines' recurrent batching does).

    K-FAC treats the LSTM input projection as one dense layer whose input
    activations are the concatenated [torso(x_t), h_{t-1}] rows over the
    whole [T*N] segment (the standard KFAC-for-RNN factorization: sum the
    Kronecker statistics over time). The Fisher G per-sample gradients
    condition on the stored hidden state — each (t, env) sample is one
    LSTM step with (h, c) as given inputs. lnlstm applies a learned
    LayerNorm on the head input; its scale/offset get the plain (momentum)
    gradient since they have no Kronecker structure.
    """

    name = "acktr"

    def __init__(self, env=None, num_envs: int = 8, policy: str = "lstm",
                 config: ACKTRConfig = None,
                 normalize_obs: Optional[bool] = None):
        assert "lstm" in policy, "RecurrentACKTR needs an lstm policy kind"
        super().__init__(
            env=env, num_envs=num_envs,
            policy="cnn" if policy.startswith("cnn") else "mlp",
            config=config, normalize_obs=normalize_obs,
        )
        self.policy_kind = policy
        self.layer_norm = "lnlstm" in policy

    # ---- layers -------------------------------------------------------
    def _layer_specs(self):
        nl = self.config.n_lstm
        if self.is_cnn:
            torso = [
                ("C1", "cb1", "conv", {"k": 8, "s": 4}),
                ("C2", "cb2", "conv", {"k": 4, "s": 2}),
                ("C3", "cb3", "conv", {"k": 3, "s": 1}),
                ("Wfc", "bfc", "dense", {}),
            ]
        else:
            torso = [("W1", "b1", "dense", {})]
        return torso + [
            ("Wl", "bl", "dense", {}),
            ("Wpi", "bpi", "dense", {}),
            ("Wv", "bv", "dense", {}),
        ]

    def _init_params(self, key):
        cfg = self.config
        h, nl = cfg.hidden, cfg.n_lstm
        ortho = jax.nn.initializers.orthogonal(np.sqrt(2))
        keys = jax.random.split(key, 8)
        if self.is_cnn:
            C = self.cnn_in_channels
            params = {
                "C1": ortho(keys[0], (8, 8, C, 32)), "cb1": jnp.zeros(32),
                "C2": ortho(keys[1], (4, 4, 32, 64)), "cb2": jnp.zeros(64),
                "C3": ortho(keys[2], (3, 3, 64, 64)), "cb3": jnp.zeros(64),
                "Wfc": ortho(keys[3], (self.cnn_flat_dim, 512)),
                "bfc": jnp.zeros(512),
            }
            e_dim = 512
        else:
            params = {
                "W1": ortho(keys[0], (self.obs_dim, h)),
                "b1": jnp.zeros(h),
            }
            e_dim = h
        params["Wl"] = jax.nn.initializers.orthogonal(1.0)(
            keys[4], (e_dim + nl, 4 * nl)
        )
        params["bl"] = jnp.zeros(4 * nl)
        params["Wpi"] = jax.nn.initializers.orthogonal(0.01)(
            keys[5], (nl, self.n_act)
        )
        params["bpi"] = jnp.zeros(self.n_act)
        params["Wv"] = jax.nn.initializers.orthogonal(1.0)(keys[6], (nl, 1))
        params["bv"] = jnp.zeros(1)
        if self.layer_norm:
            params["ln_g"] = jnp.ones(nl)
            params["ln_b"] = jnp.zeros(nl)
        return params

    # ---- forward ------------------------------------------------------
    def _torso(self, params, x):
        """(features e, torso acts dict)."""
        if self.is_cnn:
            flat, acts = self._cnn_features(params, x)
            e = jax.nn.relu(flat @ params["Wfc"] + params["bfc"])
            return e, acts
        x2d = x.reshape(x.shape[0], -1)
        e = jnp.tanh(x2d @ params["W1"] + params["b1"])
        return e, {"W1": x2d}

    def _lstm_heads(self, params, e, h_prev, c_prev, done):
        """One masked LSTM step + heads. Returns
        (logits, value, h, c, step_acts)."""
        nl = self.config.n_lstm
        mask = (1.0 - done.astype(jnp.float32))[:, None]
        h_in, c_in = h_prev * mask, c_prev * mask
        z = jnp.concatenate([e, h_in], axis=-1)
        gates = z @ params["Wl"] + params["bl"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f + 1.0) * c_in + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        h_out = h
        if self.layer_norm:
            mu = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.var(h, axis=-1, keepdims=True)
            h_out = (h - mu) / jnp.sqrt(var + 1e-5)
            h_out = h_out * params["ln_g"] + params["ln_b"]
        logits = h_out @ params["Wpi"] + params["bpi"]
        value = (h_out @ params["Wv"] + params["bv"])[..., 0]
        acts = {"Wl": z, "Wpi": h_out, "Wv": h_out,
                "_h_in": h_in, "_c_in": c_in}
        return logits, value, h, c, acts

    def _forward_step(self, params, x, lstm, done):
        e, torso_acts = self._torso(params, x)
        logits, value, h, c, acts = self._lstm_heads(
            params, e, lstm[0], lstm[1], done
        )
        acts.update(torso_acts)
        return logits, value, (h, c), acts

    # ---- Fisher G over sampled targets (hidden state conditioned) -----
    def _fisher_G_rec(self, params, x_sub, h_sub, c_sub, key):
        """True-Fisher G per layer, as the base class — each sample is one
        full torso + LSTM step + heads forward with the stored (h, c) as
        given inputs, targets drawn from the model's own distributions."""
        k1, k2 = jax.random.split(key)
        e_sub, _ = self._torso(params, x_sub)
        logits, value, _, _, _ = self._lstm_heads(
            params, e_sub, h_sub, c_sub, jnp.zeros(x_sub.shape[0], bool)
        )
        a_samp = jax.random.categorical(k1, logits)
        v_noise = jax.random.normal(k2, value.shape)
        bias_names = [b for _, b, _, _ in self._layer_specs()]
        bias_params = {b: params[b] for b in bias_names}

        def per_sample_loss(bp, x1, h1, c1, a1, n1):
            p = {**params, **bp}
            e1, _ = self._torso(p, x1[None])
            lg, v, _, _, _ = self._lstm_heads(
                p, e1, h1[None], c1[None], jnp.zeros(1, bool)
            )
            lp = jax.nn.log_softmax(lg)[0, a1]
            vf = 0.5 * jnp.square(v[0] - jax.lax.stop_gradient(v[0] + n1))
            return -lp + vf

        g = jax.vmap(jax.grad(per_sample_loss), in_axes=(None, 0, 0, 0, 0, 0))(
            bias_params, x_sub, h_sub, c_sub, a_samp, v_noise
        )
        n = x_sub.shape[0]
        return {b: g[b].T @ g[b] / n for b in bias_names}

    # ---- training -----------------------------------------------------
    def train_iteration(self, state: RecurrentACKTRState, progress=0.0):
        cfg = self.config
        key, k_roll, k_fisher = jax.random.split(state.key, 3)
        init_lstm = state.lstm_state

        def rollout_body(carry, k_step):
            vstate, obs, done, lstm, obs_norm = carry
            if obs_norm is not None:
                obs_norm = obs_norm.update(obs)
                norm_obs = obs_norm.normalize(obs)
            else:
                norm_obs = obs
            logits, value, new_lstm, _ = self._forward_step(
                state.params, norm_obs, lstm, done
            )
            action = jax.random.categorical(k_step, logits).astype(jnp.int32)
            vstate, tr = self.vec_env.step(vstate, action)
            out = (norm_obs, done, action, value, tr.reward, tr.done,
                   tr.episode_return, tr.episode_length)
            return (vstate, tr.obs, tr.done, new_lstm, obs_norm), out

        step_keys = jax.random.split(k_roll, cfg.n_steps)
        (vstate, obs, done, lstm_state, obs_norm), (
            b_obs, b_done_in, b_act, b_val, b_rew, b_done_out, ep_ret, ep_len,
        ) = jax.lax.scan(
            rollout_body,
            (state.vstate, state.obs, state.done, init_lstm, state.obs_norm),
            step_keys,
        )

        last_norm = obs_norm.normalize(obs) if obs_norm is not None else obs
        _, last_value, _, _ = self._forward_step(
            state.params, last_norm, lstm_state, done
        )
        advantages, returns = compute_gae(
            b_rew, b_val, b_done_out, last_value, cfg.gamma, 1.0
        )

        T, N = cfg.n_steps, self.num_envs

        def loss_fn(params):
            def scan_policy(lstm, inp):
                o, d = inp
                logits, v, new_lstm, acts = self._forward_step(
                    params, o, lstm, d
                )
                return new_lstm, (logits, v, acts)

            _, (logits, vpred, acts_seq) = jax.lax.scan(
                scan_policy, init_lstm, (b_obs, b_done_in)
            )
            logp_all = jax.nn.log_softmax(logits)
            logp = jnp.take_along_axis(logp_all, b_act[..., None], -1)[..., 0]
            adv = jax.lax.stop_gradient(advantages)
            pg = -jnp.mean(adv * logp)
            vf = jnp.mean(jnp.square(vpred - returns))
            ent = -jnp.mean(jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1))
            # Flatten the per-step activation stacks to [T*N, ...] rows for
            # the Kronecker statistics (sum over time = bigger row batch).
            acts = jax.tree.map(
                lambda a: a.reshape((T * N,) + a.shape[2:]), acts_seq
            )
            return pg + cfg.vf_coef * vf - cfg.ent_coef * ent, acts

        (loss, acts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                             for g in jax.tree.leaves(grads)))
        clip = jnp.minimum(1.0, cfg.max_grad_norm / (gnorm + 1e-8))
        grads = jax.tree.map(lambda g: g * clip, grads)

        ns = cfg.kfac_obs_samples
        flat_obs = b_obs.reshape((T * N,) + b_obs.shape[2:])
        fisher_G = self._fisher_G_rec(
            state.params, flat_obs[:ns], acts["_h_in"][:ns],
            acts["_c_in"][:ns], k_fisher,
        )
        acts_kfac = {k: v for k, v in acts.items() if not k.startswith("_")}
        params, momentum, kfac_A, kfac_G, eta = self._kfac_apply(
            state, grads, acts_kfac, fisher_G, progress
        )

        metrics = {
            "loss": loss,
            "eta": eta,
            "episode_return": ep_ret,
            "episode_length": ep_len,
            "mean_reward_per_step": jnp.mean(b_rew),
        }
        new_state = RecurrentACKTRState(
            params=params, momentum=momentum, kfac_A=kfac_A, kfac_G=kfac_G,
            vstate=vstate, obs=obs, done=done, lstm_state=lstm_state,
            obs_norm=obs_norm, key=key, update_idx=state.update_idx + 1,
        )
        return new_state, metrics

    def init_state(self, key) -> RecurrentACKTRState:
        cfg = self.config
        key, k_env, k_p = jax.random.split(key, 3)
        vstate, obs = self.vec_env.reset(k_env)
        params = self._init_params(k_p)
        kfac_A, kfac_G = {}, {}
        for wname, _, kind, _ in self._layer_specs():
            w = params[wname]
            if kind == "conv":
                kh, kw, cin, cout = w.shape
                in_dim, out_dim = kh * kw * cin, cout
            else:
                in_dim, out_dim = w.shape
            kfac_A[wname] = jnp.zeros((in_dim + 1, in_dim + 1))
            kfac_G[wname] = jnp.zeros((out_dim, out_dim))
        momentum = jax.tree.map(jnp.zeros_like, params)
        obs_norm = (
            RunningNorm.create(self.env.observation_space.shape)
            if self.normalize_obs else None
        )
        nl = cfg.n_lstm
        return RecurrentACKTRState(
            params=params, momentum=momentum, kfac_A=kfac_A, kfac_G=kfac_G,
            vstate=vstate, obs=obs, done=jnp.zeros(self.num_envs, bool),
            lstm_state=(jnp.zeros((self.num_envs, nl)),
                        jnp.zeros((self.num_envs, nl))),
            obs_norm=obs_norm, key=key, update_idx=jnp.int32(0),
        )

    # ---- acting (stateful LSTM) --------------------------------------
    def getAction(self, observation, dones=None, deterministic=False,
                  key=None):
        obs = jnp.asarray(observation)
        n = obs.shape[0]
        nl = self.config.n_lstm
        if not hasattr(self, "_act_lstm") or self._act_lstm[0].shape[0] != n:
            self._act_lstm = (jnp.zeros((n, nl)), jnp.zeros((n, nl)))
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        done = (jnp.zeros(n, bool) if dones is None
                else jnp.asarray(dones, bool))
        # Pre-advance context so getActionProba can report the distribution
        # this call actually acted from (not a zeroed-state one).
        self._act_ctx = (self._act_lstm, done)
        logits, _, self._act_lstm, _ = self._forward_step(
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
        nl = self.config.n_lstm
        ctx = getattr(self, "_act_ctx", None)
        if ctx is not None and ctx[0][0].shape[0] >= n:
            lstm = (ctx[0][0][:n], ctx[0][1][:n])
            done = ctx[1][:n]
        else:
            lstm = (jnp.zeros((n, nl)), jnp.zeros((n, nl)))
            done = jnp.zeros(n, bool)
        if self.state.obs_norm is not None:
            obs = self.state.obs_norm.normalize(obs)
        logits, _, _, _ = self._forward_step(
            self.state.params, obs, lstm, done
        )
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    def save(self, save_path, _locals=None):
        self._save_pickle(
            save_path,
            {"name": "acktr_lstm", "config": dataclasses.asdict(self.config),
             "num_envs": self.num_envs, "policy_kind": self.policy_kind,
             "cnn_geom": (
                 {"pool": self.pool, "flat": self.cnn_flat_dim,
                  "channels": self.cnn_in_channels}
                 if self.is_cnn else None),
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
        agent = cls(env=env, num_envs=d["num_envs"],
                    policy=d["policy_kind"],
                    config=ACKTRConfig(**d["config"]),
                    normalize_obs=d["normalize_obs"])
        if d.get("cnn_geom") and not hasattr(agent, "pool"):
            agent.pool = d["cnn_geom"]["pool"]
            agent.cnn_flat_dim = d["cnn_geom"]["flat"]
            agent.cnn_in_channels = d["cnn_geom"]["channels"]
        obs_norm = None
        if d["obs_norm"] is not None:
            obs_norm = RunningNorm(
                mean=jnp.asarray(d["obs_norm"]["mean"]),
                var=jnp.asarray(d["obs_norm"]["var"]),
                count=jnp.asarray(d["obs_norm"]["count"]),
            )
        agent.state = RecurrentACKTRState(
            params=jax.tree.map(jnp.asarray, d["params"]), momentum=None,
            kfac_A=None, kfac_G=None, vstate=None, obs=None, done=None,
            lstm_state=None, obs_norm=obs_norm, key=jax.random.PRNGKey(0),
            update_idx=jnp.int32(0),
        )
        return agent
