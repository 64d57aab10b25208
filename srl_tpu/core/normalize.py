"""On-device running observation normalization.

Replaces stable-baselines ``VecNormalize(norm_obs=True, norm_reward=False)``
as configured by the reference (rl_baselines/utils.py:216-227): a parallel
Welford/Chan running mean-variance over the observation batch, applied and
updated entirely inside the jitted training step. ``save``/``load`` mirror
``save_running_average``/``load_running_average`` (train.py:149-155).
"""
from __future__ import annotations

import os
import pickle
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

CLIP_OBS = 10.0
EPS = 1e-8


@struct.dataclass
class RunningNorm:
    mean: jax.Array
    var: jax.Array
    count: jax.Array

    @classmethod
    def create(cls, shape) -> "RunningNorm":
        return cls(
            mean=jnp.zeros(shape, jnp.float32),
            var=jnp.ones(shape, jnp.float32),
            count=jnp.asarray(1e-4, jnp.float32),
        )

    def update(self, batch: jax.Array) -> "RunningNorm":
        """Chan et al. parallel update from a [B, ...] batch (matches
        stable-baselines RunningMeanStd.update)."""
        batch = batch.astype(jnp.float32)
        batch_mean = jnp.mean(batch, axis=0)
        batch_var = jnp.var(batch, axis=0)
        batch_count = jnp.asarray(batch.shape[0], jnp.float32)

        delta = batch_mean - self.mean
        tot = self.count + batch_count
        new_mean = self.mean + delta * batch_count / tot
        m_a = self.var * self.count
        m_b = batch_var * batch_count
        m2 = m_a + m_b + jnp.square(delta) * self.count * batch_count / tot
        return RunningNorm(mean=new_mean, var=m2 / tot, count=tot)

    def normalize(self, x: jax.Array, clip: float = CLIP_OBS) -> jax.Array:
        out = (x - self.mean) / jnp.sqrt(self.var + EPS)
        return jnp.clip(out, -clip, clip)

    # -- checkpoint interface (train.py:149-155 analogue) ---------------
    def save(self, path: str, name: str = "obs_rms"):
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, f"{name}.pkl"), "wb") as f:
            pickle.dump(
                {
                    "mean": np.asarray(self.mean),
                    "var": np.asarray(self.var),
                    "count": float(self.count),
                },
                f,
            )

    @classmethod
    def load(cls, path: str, name: str = "obs_rms") -> "RunningNorm":
        with open(os.path.join(path, f"{name}.pkl"), "rb") as f:
            d = pickle.load(f)
        return cls(
            mean=jnp.asarray(d["mean"]),
            var=jnp.asarray(d["var"]),
            count=jnp.asarray(d["count"], jnp.float32),
        )
