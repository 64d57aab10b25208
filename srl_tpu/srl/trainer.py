"""SRL encoder training — the srl_zoo capability, on-device.

The reference repo treats SRL training as an external PyTorch project (the
srl_zoo submodule, SURVEY §2.9) reached through a ZMQ server or offline CLI;
here it is a jitted JAX training loop over recorded transition datasets with
the same loss families: autoencoder, denoising AE, VAE, supervised,
forward/inverse dynamics, reward prediction, robotic priors, and multi-view
triplets; plus PCA as an SVD baseline (state_representation/models.py:196-217).

Checkpoint layout mirrors srl_zoo's: a model file next to an
``exp_config.json`` holding {"state-dim", "losses", "model-type"}
(state_representation/models.py:53-73 reads exactly these keys).
"""
from __future__ import annotations

import json
import os
import pickle
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from srl_tpu.srl.nets import SRLModules, split_ranges


def _pairs_indices(episode_starts: np.ndarray) -> np.ndarray:
    """Indices i such that (i, i+1) is a valid within-episode transition."""
    n = len(episode_starts)
    ok = ~np.asarray(episode_starts[1:], bool)
    return np.nonzero(ok)[0].astype(np.int32)


class SRLTrainer:
    """Trains an ``SRLModules`` network on a recorded dataset dict with keys
    observations/actions/rewards/episode_starts/ground_truth_states."""

    def __init__(
        self,
        state_dim: int,
        losses: List[str],
        image_obs: bool = True,
        obs_shape: Tuple[int, ...] = (224, 224, 3),
        n_actions: int = 4,
        learning_rate: float = 1e-3,
        beta_vae: float = 1.0,
        noise_std_dae: float = 0.2,
        seed: int = 0,
        split_dimensions: Optional[Dict[str, int]] = None,
    ):
        self.state_dim = state_dim
        self.losses = list(losses)
        # SRLModulesSplit mode: each loss owns a state-vector slice
        # (state_representation/models.py:60-92 resolves 'split-dimensions'
        # from exp_config.json).
        self.split_dimensions = dict(split_dimensions) if split_dimensions else None
        self.ranges = split_ranges(self.losses, state_dim, self.split_dimensions)
        self.image_obs = image_obs
        self.obs_shape = tuple(obs_shape)
        self.n_actions = n_actions
        self.beta_vae = beta_vae
        self.noise_std_dae = noise_std_dae
        self.seed = seed
        self.model = SRLModules(
            state_dim=state_dim,
            losses=tuple(self.losses),
            image_obs=image_obs,
            obs_hw=self.obs_shape[:2] if image_obs else (0, 0),
            channels=self.obs_shape[2] if image_obs else 0,
            n_actions=n_actions,
            split_dimensions=tuple(self.split_dimensions.items())
            if self.split_dimensions
            else (),
        )
        self.tx = optax.adam(learning_rate)
        self.params = None

    # ------------------------------------------------------------------
    def _loss_fn(self, params, batch, key):
        obs, obs_next, actions, rewards, gt = batch
        m = self.model
        total = 0.0
        logs = {}

        if "triplet" in self.losses:
            # Multi-view: channels split into two views
            # (srl_zoo triplet over camera pairs; models.py:93-94 sets 6ch).
            # Kept as three separate encodes: batching them into one 3B
            # call requires materializing the strided channel-slice copies
            # for the concat, and measured (v5e, b128) slightly SLOWER
            # (16.6k vs 17.3k img/s median) than letting XLA consume the
            # slices in place — unlike the pair-encode fusion below whose
            # inputs are whole frames.
            c = obs.shape[-1] // 2
            anchor = m.apply(params, obs[..., :c], method=SRLModules.encode)
            positive = m.apply(params, obs[..., c:], method=SRLModules.encode)
            s = anchor
            s_next = m.apply(params, obs_next[..., :c], method=SRLModules.encode)
            negative = jnp.roll(positive, 1, axis=0)
            d_ap = jnp.sum(jnp.square(anchor - positive), axis=-1)
            d_an = jnp.sum(jnp.square(anchor - negative), axis=-1)
            trip = jnp.mean(jnp.maximum(d_ap - d_an + 1.0, 0.0))
            total += trip
            logs["triplet"] = trip
        elif "vae" in self.losses:
            mu, log_var = m.apply(params, obs, method=SRLModules.vae_posterior)
            key, sub = jax.random.split(key)
            a, b = self.ranges["vae"]
            eps = jax.random.normal(sub, log_var.shape)
            # Reparameterize the vae slice only; other slices deterministic.
            s = mu.at[..., a:b].add(eps * jnp.exp(0.5 * log_var))
            s_next = m.apply(params, obs_next, method=SRLModules.encode)
            mu_v = mu[..., a:b]
            kl = -0.5 * jnp.mean(
                jnp.sum(1 + log_var - jnp.square(mu_v) - jnp.exp(log_var), axis=-1)
            )
            total += self.beta_vae * kl * 0.001
            logs["kl"] = kl
        else:
            enc_in = obs
            if "dae" in self.losses:
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, obs.shape) * (
                    self.noise_std_dae * 255.0
                )
                enc_in = jnp.clip(obs.astype(jnp.float32) + noise, 0, 255)
            if any(l in self.losses
                   for l in ("forward", "inverse", "reward", "priors")):
                # Losses over (s, s_next) pairs: encode both frames in ONE
                # 2B-batch call (rows are independent, same math, double
                # the MXU occupancy vs two B-sized passes).
                both = m.apply(
                    params,
                    jnp.concatenate(
                        # float32 is what the encoder casts to first, so
                        # concatenating there is exact for uint8 frames and
                        # preserves the dae noise.
                        [enc_in.astype(jnp.float32),
                         obs_next.astype(jnp.float32)], axis=0
                    ),
                    method=SRLModules.encode,
                )
                s, s_next = jnp.split(both, 2, axis=0)
            else:
                s = m.apply(params, enc_in, method=SRLModules.encode)
                s_next = None  # no configured loss reads it

        if any(l in self.losses for l in ("autoencoder", "vae", "dae")):
            recon = m.apply(params, s, method=SRLModules.decode)
            target = obs.astype(jnp.float32) / 255.0 if self.image_obs else obs
            rec = jnp.mean(jnp.square(recon - target))
            total += rec
            logs["reconstruction"] = rec

        if "supervised" in self.losses:
            # Supervise the leading state dims with the ground truth
            # (srl_zoo's supervised model maps to the GT dimension).
            d = min(s.shape[-1], gt.shape[-1])
            sup = jnp.mean(jnp.square(s[..., :d] - gt[..., :d]))
            total += sup
            logs["supervised"] = sup

        if "forward" in self.losses:
            a_onehot = jax.nn.one_hot(actions, self.n_actions)
            pred = m.apply(params, s, a_onehot, method=SRLModules.predict_forward)
            fa, fb = self.ranges["forward"]
            target = jax.lax.stop_gradient(s_next[..., fa:fb])
            fwd = jnp.mean(jnp.square(pred - target))
            total += fwd
            logs["forward"] = fwd

        if "inverse" in self.losses:
            logits = m.apply(params, s, s_next, method=SRLModules.predict_inverse)
            inv = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, actions)
            )
            total += 2.0 * inv
            logs["inverse"] = inv

        if "reward" in self.losses:
            logits = m.apply(params, s, s_next, method=SRLModules.predict_reward)
            classes = (jnp.sign(rewards) + 1).astype(jnp.int32)
            rew = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, classes)
            )
            total += rew
            logs["reward"] = rew

        if "priors" in self.losses:
            # Robotic priors (Jonschkowski & Brock 2015), as in srl_zoo:
            # slowness, variability, proportionality, repeatability.
            ds = s_next - s
            slowness = jnp.mean(jnp.sum(jnp.square(ds), axis=-1))
            perm_s = jnp.roll(s, 1, axis=0)
            variability = jnp.mean(
                jnp.exp(-jnp.sum(jnp.square(s - perm_s), axis=-1))
            )
            ds_perm = jnp.roll(ds, 1, axis=0)
            a_perm = jnp.roll(actions, 1, axis=0)
            same_action = (actions == a_perm).astype(jnp.float32)
            mag = jnp.sqrt(jnp.sum(jnp.square(ds), axis=-1) + 1e-8)
            mag_p = jnp.sqrt(jnp.sum(jnp.square(ds_perm), axis=-1) + 1e-8)
            proportionality = jnp.sum(
                same_action * jnp.square(mag - mag_p)
            ) / (jnp.sum(same_action) + 1e-8)
            rep = jnp.exp(-jnp.sum(jnp.square(s - perm_s), axis=-1)) * jnp.sum(
                jnp.square(ds - ds_perm), axis=-1
            )
            repeatability = jnp.sum(same_action * rep) / (jnp.sum(same_action) + 1e-8)
            priors = slowness + variability + proportionality + repeatability
            total += priors
            logs["priors"] = priors

        logs["total"] = total
        return total, logs

    # ------------------------------------------------------------------
    def fit(
        self,
        dataset: Dict[str, np.ndarray],
        epochs: int = 5,
        batch_size: int = 64,
        log_fn=None,
        updates_per_call: Optional[int] = None,
    ) -> Dict:
        """Train for `epochs` passes over the transition pairs.

        `updates_per_call` fuses that many minibatch SGD steps into one
        device dispatch (a lax.scan over a [K, B] index matrix); the
        default (None) fuses a whole epoch, capped at 64 steps/dispatch.
        Measured v5e (224x224 AE, batch 128, tunneled host): the raw
        fused epoch step runs ~36k img/s, but per-minibatch dispatch
        loses most of it to host-side work each paying tunnel latency —
        a `jax.random.split` device op and a row upload per minibatch,
        a log readback per epoch, and an UNjitted Flax init re-running
        the encoder eagerly op-by-op every fit (~200 ms). With keys
        derived in-graph (fold_in on the global minibatch index),
        epoch-fused chunks, cached jitted init, and logs materialized
        once at fit end, fit() delivers 21k img/s at batch 128 and 24k
        at batch 512 (vs 8.3k per-minibatch). Earlier rounds' ~500
        img/s plateau was the per-fit dataset re-upload (308 MB ~= 28 s
        through the tunnel) — fixed by the device-data cache below."""
        obs = np.asarray(dataset["observations"])
        actions = np.asarray(dataset["actions"])
        rewards = np.asarray(dataset["rewards"], np.float32)
        episode_starts = np.asarray(dataset["episode_starts"], bool)
        gt = np.asarray(dataset["ground_truth_states"], np.float32)

        if actions.ndim > 1:
            # Continuous actions: inverse/priors losses use a discretized bin.
            actions_idx = np.zeros(len(actions), np.int32)
        else:
            actions_idx = actions.astype(np.int32)

        idx = _pairs_indices(episode_starts)
        rng = np.random.RandomState(self.seed)

        # Parameter init and the training key are cached per trainer: the
        # init key and shapes are fixed, so params0 is bit-identical every
        # fit — and an UNcached Flax init runs the whole encoder forward
        # eagerly, op by op, each op paying a tunnel round-trip (~200 ms
        # per fit measured on a remote v5e). The training base key is
        # pulled to the host once; per-minibatch keys are derived from it
        # INSIDE the jitted step (fold_in on the global minibatch index) so
        # fit() issues no host-side jax.random calls at all.
        shapes_sig = (obs.shape[1:], obs.dtype.str, gt.shape[1:])
        cache_init = getattr(self, "_init_cache", None)
        if cache_init is None or cache_init[0] != shapes_sig:
            k = jax.random.PRNGKey(self.seed)
            k_init, k_train = jax.random.split(k)
            batch0 = (
                jnp.zeros((2,) + obs.shape[1:], obs.dtype),
                jnp.zeros((2,) + obs.shape[1:], obs.dtype),
                jnp.zeros((2,), jnp.int32),
                jnp.zeros((2,), jnp.float32),
                jnp.zeros((2,) + gt.shape[1:], jnp.float32),
            )
            params0 = jax.jit(self._init_full)(k_init, batch0)
            self._init_cache = (shapes_sig, np.asarray(k_train), params0)
        _, base_key, params0 = self._init_cache
        self.params = params0

        opt_state = self.tx.init(self.params)
        # Upload the dataset to the device ONCE and gather minibatches by
        # index inside the jitted step. Re-slicing on the host shipped
        # ~2x batch x 150 KB of pixels per step through the host->device
        # link — on a tunneled TPU that transfer alone capped training at
        # ~150 imgs/s; device-resident data moves only the [K, B] index
        # matrix per dispatch. The device copies are also cached across
        # fit() calls on the SAME dataset (identity check): re-uploading a
        # 2048-frame 224x224 set through the tunnel costs whole seconds —
        # it, not the SGD steps, dominated repeated fits (measured ~500
        # img/s upload-bound vs the compute rate below).
        cache = getattr(self, "_device_data_cache", None)
        # Keyed on the identity of ALL FOUR source arrays: a fit() reusing
        # the same observations with different actions/rewards/ground-truth
        # must not train on stale device copies of the other three.
        src = (dataset["observations"], dataset["actions"],
               dataset["rewards"], dataset["ground_truth_states"])
        if cache is not None and len(cache[0]) == len(src) and all(
            a is b for a, b in zip(cache[0], src)
        ):
            obs_dev, actions_dev, rewards_dev, gt_dev = cache[1]
        else:
            obs_dev = jnp.asarray(obs)
            actions_dev = jnp.asarray(actions_idx)
            rewards_dev = jnp.asarray(rewards)
            gt_dev = jnp.asarray(gt)
            self._device_data_cache = (
                src, (obs_dev, actions_dev, rewards_dev, gt_dev)
            )
        params = self.params
        b_eff = min(batch_size, len(idx))
        if b_eff < 2:
            raise ValueError("dataset has fewer than 2 transition pairs")
        n_batches = len(idx) // b_eff
        # Chunk the epoch's minibatches into fused scans of k_main steps
        # plus one remainder scan; both shapes are stable across epochs so
        # at most two step graphs compile per fit. Default: one dispatch
        # per epoch (capped so a huge dataset can't turn one dispatch into
        # a minutes-long opaque device call).
        if updates_per_call is None:
            k_main = min(n_batches, 64)
        else:
            k_main = max(1, min(int(updates_per_call), n_batches))
        n_chunks, rem = divmod(n_batches, k_main)
        epoch_logs_dev = []
        for epoch in range(epochs):
            rng.shuffle(idx)
            mat = idx[: n_batches * b_eff].reshape(n_batches, b_eff)
            epoch_logs = None
            for c in range(n_chunks + (1 if rem else 0)):
                k = k_main if c < n_chunks else rem
                rows = mat[c * k_main : c * k_main + k]
                # Global minibatch index seeds the in-graph key derivation.
                offset = np.int32(epoch * n_batches + c * k_main)
                params, opt_state, epoch_logs = self._jit_train_step_k(k)(
                    params, opt_state, obs_dev, actions_dev, rewards_dev,
                    gt_dev, rows, base_key, offset,
                )
            epoch_logs_dev.append(epoch_logs)
            if log_fn and epoch_logs is not None:
                # Materializing logs mid-fit drains the dispatch pipeline;
                # only do it when the caller asked to observe epochs live.
                log_fn(epoch, {k: float(v) for k, v in epoch_logs.items()})
        self.params = params
        # One transfer for the whole history instead of one sync per epoch.
        history = [
            {k: float(v) for k, v in logs.items()}
            for logs in jax.device_get(epoch_logs_dev)
        ]
        return {
            "history": history,
            # Images actually trained on (drop-last epoch truncation):
            # callers metering img/s must divide by THIS, not the dataset
            # size — at batch 512 over 2016 pairs the difference is 25%.
            "images_trained": epochs * n_batches * b_eff,
        }

    def _jit_train_step_k(self, k: int):
        """Jitted K-fused SGD step (lax.scan over K minibatches per device
        call), cached per K across fit() calls — re-wrapping a fresh closure
        in jax.jit per fit re-traces and re-compiles the whole encoder+heads
        graph (~30 s for the 224x224 CNN), which dominated repeated fits
        (measured 109 imgs/s with the per-fit jit vs the compiled step's
        real throughput). The scan body compiles once regardless of K."""
        cache = getattr(self, "_train_step_cache", None)
        if cache is None:
            cache = self._train_step_cache = {}
        if k in cache:
            return cache[k]

        @jax.jit
        def train_step_k(params, opt_state, obs, actions, rewards, gt,
                         bidx_mat, base_key, offset):
            # Per-minibatch keys derived on device from the global
            # minibatch index — no host-side split per chunk.
            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
                offset + jnp.arange(bidx_mat.shape[0])
            )

            def body(carry, xs):
                params, opt_state = carry
                bidx, key = xs
                batch = (obs[bidx], obs[bidx + 1], actions[bidx],
                         rewards[bidx], gt[bidx])
                (loss, logs), grads = jax.value_and_grad(
                    self._loss_fn, has_aux=True
                )(params, batch, key)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), logs

            (params, opt_state), logs = jax.lax.scan(
                body, (params, opt_state), (bidx_mat, keys)
            )
            last = jax.tree.map(lambda x: x[-1], logs)
            return params, opt_state, last

        cache[k] = train_step_k
        return train_step_k

    def _init_full(self, key, batch):
        """Initialize parameters for the encoder and every configured head by
        running a bound call that touches all of them."""
        obs, obs_next, actions, rewards, gt = batch
        m = self.model

        def touch_all(mdl, obs, obs_next, actions):
            if "triplet" in self.losses:
                c = obs.shape[-1] // 2
                s = mdl.encode(obs[..., :c])
                s_next = mdl.encode(obs_next[..., :c])
            elif "vae" in self.losses:
                s, _ = mdl.vae_posterior(obs)
                s_next = mdl.encode(obs_next)
            else:
                s = mdl.encode(obs)
                s_next = mdl.encode(obs_next)
            if any(l in self.losses for l in ("autoencoder", "vae", "dae")):
                mdl.decode(s)
            if "forward" in self.losses:
                mdl.predict_forward(s, jax.nn.one_hot(actions, self.n_actions))
            if "inverse" in self.losses:
                mdl.predict_inverse(s, s_next)
            if "reward" in self.losses:
                mdl.predict_reward(s, s_next)
            return s

        return m.init(key, obs, obs_next, actions, method=touch_all)

    # ------------------------------------------------------------------
    def encode(self, observations) -> np.ndarray:
        obs = jnp.asarray(observations)
        if "triplet" in self.losses and obs.shape[-1] > self.obs_shape[2]:
            obs = obs[..., : self.obs_shape[2]]
        return np.asarray(
            self.model.apply(self.params, obs, method=SRLModules.encode)
        )

    def save(self, log_dir: str):
        """srl_zoo-compatible layout: exp_config.json + model checkpoint."""
        os.makedirs(log_dir, exist_ok=True)
        exp_config = {
            "state-dim": self.state_dim,
            "losses": self.losses,
            "model-type": "custom_cnn" if self.image_obs else "mlp",
            "n_actions": self.n_actions,
            "obs-shape": list(self.obs_shape),
        }
        if self.split_dimensions:
            # Ordered loss -> slice-width map, as the reference reads it
            # (state_representation/models.py:68-73).
            exp_config["split-dimensions"] = {
                k: int(v) for k, v in self.split_dimensions.items()
            }
        with open(os.path.join(log_dir, "exp_config.json"), "w") as f:
            json.dump(exp_config, f, indent=2)
        payload = {
            "exp_config": exp_config,
            "params": jax.tree.map(np.asarray, self.params),
        }
        model_path = os.path.join(log_dir, "srl_model.pkl")
        with open(model_path, "wb") as f:
            pickle.dump(payload, f)
        return model_path


def fit_pca(observations: np.ndarray, state_dim: int) -> Dict:
    """PCA baseline: SVD of flattened pixels (SRLPCA,
    state_representation/models.py:196-217) — on device, as matmuls."""
    x = np.asarray(observations, np.float32).reshape(len(observations), -1) / 255.0
    mean = x.mean(axis=0)
    xc = jnp.asarray(x - mean)
    # Economy SVD via covariance eigendecomposition in feature space when
    # samples < features.
    if xc.shape[0] < xc.shape[1]:
        gram = xc @ xc.T
        w, v = jnp.linalg.eigh(gram)
        order = jnp.argsort(w)[::-1][:state_dim]
        v = v[:, order]
        w = jnp.maximum(w[order], 1e-8)
        components = (xc.T @ v) / jnp.sqrt(w)[None, :]  # [F, D]
    else:
        _, _, vt = jnp.linalg.svd(xc, full_matrices=False)
        components = vt[:state_dim].T
    return {
        "mean": np.asarray(mean),
        "components": np.asarray(components, np.float32),
        "state_dim": state_dim,
    }


def save_pca(pca: Dict, log_dir: str) -> str:
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "exp_config.json"), "w") as f:
        json.dump({"state-dim": pca["state_dim"], "losses": ["pca"],
                   "model-type": "pca"}, f)
    path = os.path.join(log_dir, "pca.pkl")
    with open(path, "wb") as f:
        pickle.dump(pca, f)
    return path
