"""Observation preprocessing — the srl_zoo.preprocessing surface.

The reference imports ``preprocessImage``/``getNChannels``/``N_CHANNELS``
from the srl_zoo submodule (state_representation/models.py:8-10,
kuka_button_gym_env.py:12). Here resizing/normalization is jax.image math
(no OpenCV on the training path); multi-view observations (6 channels)
toggle through ``N_CHANNELS`` exactly like srl_zoo's global.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IMAGE_WIDTH = 224
IMAGE_HEIGHT = 224
N_CHANNELS = 3  # 6 for multi-view (models.py:93-94 sets this)


def getNChannels() -> int:
    return N_CHANNELS


def setNChannels(n: int):
    global N_CHANNELS
    N_CHANNELS = n


def preprocessImage(image, convert_to_rgb: bool = False):
    """uint8 [H, W, C] -> float32 [IMAGE_HEIGHT, IMAGE_WIDTH, C] in [-1, 1]
    (srl_zoo's preprocessing: resize + scale + center)."""
    img = jnp.asarray(image)
    if img.shape[:2] != (IMAGE_HEIGHT, IMAGE_WIDTH):
        img = jax.image.resize(
            img.astype(jnp.float32),
            (IMAGE_HEIGHT, IMAGE_WIDTH, img.shape[-1]),
            method="bilinear",
        )
    img = img.astype(jnp.float32) / 255.0
    return img * 2.0 - 1.0


def deNormalize(x):
    """Inverse of preprocessImage's scaling: [-1, 1] -> [0, 1]."""
    return (jnp.asarray(x) + 1.0) / 2.0
