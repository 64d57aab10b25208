"""Functional action/observation spaces.

JAX-native analogue of the gym spaces the reference uses
(``spaces.Discrete``/``spaces.Box``, e.g. mobile_robot_env.py:134-145).
``sample`` is a pure function of a PRNG key so it can live inside jitted
rollout loops.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Space:
    shape: Tuple[int, ...]
    dtype: np.dtype

    def sample(self, key: jax.Array) -> jax.Array:
        raise NotImplementedError

    def contains(self, x) -> bool:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Discrete(Space):
    n: int = 0

    def __init__(self, n: int):
        object.__setattr__(self, "n", int(n))
        object.__setattr__(self, "shape", ())
        object.__setattr__(self, "dtype", np.dtype(np.int32))

    def sample(self, key: jax.Array) -> jax.Array:
        return jax.random.randint(key, (), 0, self.n, dtype=jnp.int32)

    def contains(self, x) -> bool:
        return bool(0 <= int(x) < self.n)


@dataclasses.dataclass(frozen=True)
class Box(Space):
    low: np.ndarray = None
    high: np.ndarray = None

    def __init__(self, low, high, shape=None, dtype=np.float32):
        if shape is None:
            shape = np.broadcast(np.asarray(low), np.asarray(high)).shape
        low = np.broadcast_to(np.asarray(low, dtype=dtype), shape)
        high = np.broadcast_to(np.asarray(high, dtype=dtype), shape)
        object.__setattr__(self, "low", low)
        object.__setattr__(self, "high", high)
        object.__setattr__(self, "shape", tuple(shape))
        object.__setattr__(self, "dtype", np.dtype(dtype))

    def sample(self, key: jax.Array) -> jax.Array:
        low = jnp.asarray(self.low)
        high = jnp.asarray(self.high)
        finite = np.isfinite(self.low).all() and np.isfinite(self.high).all()
        if finite:
            return jax.random.uniform(
                key, self.shape, minval=low, maxval=high, dtype=jnp.float32
            )
        return jax.random.normal(key, self.shape, dtype=jnp.float32)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return bool(
            x.shape == self.shape and (x >= self.low).all() and (x <= self.high).all()
        )
