"""Minimal policy distributions (categorical / diagonal Gaussian).

Self-contained (no tfp dependency) so everything stays jit-traceable and
TPU-friendly; matches the distributions stable-baselines policies use under
the reference's algorithms.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Categorical(NamedTuple):
    logits: jax.Array  # [..., n]

    def sample(self, key: jax.Array) -> jax.Array:
        return jax.random.categorical(key, self.logits, axis=-1)

    def log_prob(self, actions: jax.Array) -> jax.Array:
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        return jnp.take_along_axis(logp, actions[..., None].astype(jnp.int32), axis=-1)[
            ..., 0
        ]

    def entropy(self) -> jax.Array:
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        return -jnp.sum(jnp.exp(logp) * logp, axis=-1)

    def mode(self) -> jax.Array:
        return jnp.argmax(self.logits, axis=-1)

    def probs(self) -> jax.Array:
        return jax.nn.softmax(self.logits, axis=-1)


class DiagGaussian(NamedTuple):
    mean: jax.Array  # [..., d]
    log_std: jax.Array  # [..., d] (broadcastable)

    def sample(self, key: jax.Array) -> jax.Array:
        noise = jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)
        return self.mean + jnp.exp(self.log_std) * noise

    def log_prob(self, actions: jax.Array) -> jax.Array:
        var = jnp.exp(2 * self.log_std)
        logp = -0.5 * (
            jnp.square(actions - self.mean) / var
            + 2 * self.log_std
            + jnp.log(2 * jnp.pi)
        )
        return jnp.sum(logp, axis=-1)

    def entropy(self) -> jax.Array:
        return jnp.sum(self.log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)

    def mode(self) -> jax.Array:
        return self.mean
