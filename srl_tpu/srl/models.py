"""SRL model serving: load a trained encoder and apply it in-batch on device.

Replaces state_representation/models.py. The reference's
``MultiprocessSRLModel`` queue server (rl_baselines/utils.py:162-191) and the
per-env pipe round-trip (srl_env.py:44-49) disappear entirely: ``getStates``
is a jitted function applied to the full observation batch inside the
training step.
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from srl_tpu.srl.nets import SRLModules


def getSRLDim(path: Optional[str] = None, env=None) -> int:
    """State dimension from the exp_config.json next to the checkpoint, else
    the env ground-truth dim (state_representation/models.py:16-35)."""
    if path is not None:
        config_path = os.path.join(os.path.dirname(path), "exp_config.json")
        with open(config_path) as f:
            exp_config = json.load(f)
        return exp_config["state-dim"]
    return env.ground_truth_dim()


class SRLBaseModel:
    state_dim: int = -1

    def getState(self, observations):
        """[B, ...obs] -> [B, state_dim]; pure and jit/vmap-safe."""
        raise NotImplementedError

    def getStates(self, observations):
        return self.getState(observations)

    def encode_single(self, obs):
        """Unbatched, trace-safe encode of one observation — the hook
        SRLEncodedEnv.observe dispatches through under vmap."""
        raise NotImplementedError


class SRLNeuralNetwork(SRLBaseModel):
    """A trained SRLModules encoder (state_representation/models.py:141-193
    equivalent; no torch, no no_grad — pure application)."""

    def __init__(self, payload: dict):
        cfg = payload["exp_config"]
        self.state_dim = cfg["state-dim"]
        self.losses = cfg["losses"]
        self.image_obs = cfg.get("model-type", "custom_cnn") != "mlp"
        obs_shape = tuple(cfg.get("obs-shape", (224, 224, 3)))
        self.obs_shape = obs_shape
        # Split-dimension bookkeeping (state_representation/models.py:68-73):
        # a loss -> slice-width map; zero total width means combination mode.
        split = cfg.get("split-dimensions") or {}
        if sum(split.values()) == 0:
            split = {}
        self.split_dimensions = split
        self.model = SRLModules(
            state_dim=self.state_dim,
            losses=tuple(self.losses),
            image_obs=self.image_obs,
            obs_hw=obs_shape[:2] if self.image_obs else (0, 0),
            channels=obs_shape[2] if self.image_obs else 0,
            n_actions=cfg.get("n_actions", 4),
            split_dimensions=tuple(split.items()),
        )
        self.params = jax.tree.map(jnp.asarray, payload["params"])
        self._encode = jax.jit(
            lambda obs: self.model.apply(self.params, obs, method=SRLModules.encode)
        )

    def getState(self, observations):
        obs = jnp.asarray(observations)
        squeeze = obs.ndim == len(self.obs_shape)
        if squeeze:
            obs = obs[None]
        if "triplet" not in self.losses and obs.shape[-1] > self.obs_shape[-1]:
            obs = obs[..., : self.obs_shape[-1]]
        out = self._encode(obs)
        return out[0] if squeeze else out

    def encode_single(self, obs):
        enc = self.model.apply(self.params, obs[None], method=SRLModules.encode)
        return enc[0]


class SRLPCA(SRLBaseModel):
    """PCA projection as a single matmul (models.py:196-217)."""

    def __init__(self, payload: dict):
        self.state_dim = payload["state_dim"]
        self.mean = jnp.asarray(payload["mean"])
        self.components = jnp.asarray(payload["components"])  # [F, D]

    def getState(self, observations):
        obs = jnp.asarray(observations, jnp.float32)
        squeeze = obs.ndim == 3
        if squeeze:
            obs = obs[None]
        flat = obs.reshape(obs.shape[0], -1) / 255.0
        out = (flat - self.mean) @ self.components
        return out[0] if squeeze else out

    def encode_single(self, obs):
        flat = jnp.asarray(obs, jnp.float32).reshape(-1) / 255.0
        return (flat - self.mean) @ self.components


def loadSRLModel(
    path: Optional[str] = None,
    state_dim: int = -1,
    env=None,
):
    """Resolve and load an SRL model (state_representation/models.py:38-107):
    reads losses/model-type from exp_config.json; 'pca' paths load the PCA
    baseline."""
    assert path is not None, "No path to the SRL model given"
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if "components" in payload or "pca" in path:
        return SRLPCA(payload)
    return SRLNeuralNetwork(payload)


class SRLEncodedEnv:
    """Env wrapper: observe() renders pixels and applies the encoder — the
    on-device replacement of the srl_pipe round-trip (srl_env.py:44-49).
    Works under vmap: the encoder conv becomes one batched conv."""

    # Never forwarded from the wrapped env via __getattr__: a wrapped
    # MixedEnv would otherwise make VecEnv.__new__ dispatch to MixedVecEnv,
    # which vectorizes the RAW families and silently skips the encoder.
    is_mixed_family = False

    def __init__(self, env, srl_model: SRLBaseModel):
        if getattr(env, "is_mixed_family", False):
            raise ValueError(
                "SRLEncodedEnv cannot wrap a MixedEnv: the per-family "
                "VecEnvs would vectorize the raw families and skip the "
                "encoder. Wrap each family instead: "
                "MixedEnv([SRLEncodedEnv(f, model) for f in families])"
            )
        self._env = env
        self._srl = srl_model
        self.srl_model = "srl_encoded"
        self.state_dim = srl_model.state_dim

    def __getattr__(self, name):
        return getattr(self._env, name)

    @property
    def observation_space(self):
        from srl_tpu.core.spaces import Box

        return Box(-np.inf, np.inf, (self.state_dim,))

    def observe(self, state):
        pixels = self._env.render_pixels(state)
        # Polymorphic dispatch; vmap over envs batches the encoder call.
        return self._srl.encode_single(jnp.asarray(pixels))

    def observe_batched(self, states):
        """Batched render + encode. MUST be defined here: ``__getattr__``
        would otherwise forward VecEnv's ``observe_batched`` probe to the
        wrapped env, whose batched path (e.g. the Kuka Pallas renderer)
        returns RAW pixels — the encoder would be silently skipped."""
        batched = getattr(self._env, "observe_batched", None)
        if batched is not None:
            pixels = batched(states)
        else:
            pixels = jax.vmap(self._env.render_pixels)(states)
        return self._srl.getStates(pixels)
