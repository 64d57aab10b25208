"""SRL encoder/decoder networks (the srl_zoo model zoo, TPU-native).

The reference delegates these to the srl_zoo submodule
(state_representation/models.py:141-193 wraps ``SRLModules``/
``SRLModulesSplit``/``CustomCNN``); here they are Flax modules compiled by
XLA, with bfloat16 conv compute on the MXU.

``SRLModules`` = encoder + optional heads (decoder / forward / inverse /
reward) selected by the loss set; split-dimension variants carve the state
vector into per-loss slices (srl_zoo SRLModulesSplit semantics).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

ORTHO = nn.initializers.orthogonal(float(np.sqrt(2)))


def split_ranges(losses, state_dim, split_dimensions):
    """Resolve per-loss (start, end) state-vector slices.

    SRLModulesSplit semantics (srl_zoo, resolved through exp_config.json's
    'split-dimensions' by state_representation/models.py:60-92): each loss
    owns a contiguous slice of the state vector, allocated in loss order; a
    dimension of -1 takes all remaining dims. With ``split_dimensions=None``
    every loss sees the full vector (SRLModules combination mode).
    """
    if not split_dimensions:
        return {loss: (0, state_dim) for loss in losses}
    split = dict(split_dimensions)
    explicit = sum(d for d in split.values() if d > 0)
    rest = state_dim - explicit
    n_rest = sum(1 for d in split.values() if d < 0)
    assert rest >= 0, f"split dims {split} exceed state_dim {state_dim}"
    assert n_rest <= 1, "at most one loss may take the remaining dims (-1)"
    ranges, start = {}, 0
    for loss in losses:
        d = split.get(loss, 0)
        if d < 0:
            d = rest
        if d == 0:
            # Loss without a dedicated slice: sees the full vector.
            ranges[loss] = (0, state_dim)
            continue
        ranges[loss] = (start, start + d)
        start += d
    assert start <= state_dim, (ranges, state_dim)
    return ranges


class SRLConvEncoder(nn.Module):
    """CustomCNN-equivalent encoder: pixels -> state vector."""

    state_dim: int

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C] uint8 or float
        x = x.astype(jnp.float32) / 255.0
        x = x.astype(jnp.bfloat16)
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding="SAME", kernel_init=ORTHO,
            dtype=jnp.bfloat16, name=name,
        )
        x = nn.relu(conv(32, 8, 4, "c1")(x))
        x = nn.relu(conv(64, 4, 2, "c2")(x))
        x = nn.relu(conv(64, 3, 2, "c3")(x))
        x = x.reshape((x.shape[0], -1)).astype(jnp.float32)
        x = nn.relu(nn.Dense(256, kernel_init=ORTHO, name="fc1")(x))
        return nn.Dense(self.state_dim, kernel_init=ORTHO, name="state")(x)


class SRLMlpEncoder(nn.Module):
    """MLP encoder for vector observations."""

    state_dim: int

    @nn.compact
    def __call__(self, x):
        x = x.reshape((x.shape[0], -1)).astype(jnp.float32)
        x = nn.relu(nn.Dense(128, kernel_init=ORTHO)(x))
        x = nn.relu(nn.Dense(128, kernel_init=ORTHO)(x))
        return nn.Dense(self.state_dim, kernel_init=ORTHO)(x)


class SRLDeconvDecoder(nn.Module):
    """state vector -> pixels (autoencoder/VAE reconstruction head)."""

    out_hw: Tuple[int, int]
    channels: int = 3

    @nn.compact
    def __call__(self, s):
        h0 = max(self.out_hw[0] // 16, 1)
        w0 = max(self.out_hw[1] // 16, 1)
        x = nn.relu(nn.Dense(h0 * w0 * 64, kernel_init=ORTHO)(s))
        x = x.reshape((s.shape[0], h0, w0, 64)).astype(jnp.bfloat16)
        deconv = lambda f, name: nn.ConvTranspose(
            f, (4, 4), strides=(2, 2), padding="SAME", kernel_init=ORTHO,
            dtype=jnp.bfloat16, name=name,
        )
        x = nn.relu(deconv(64, "d1")(x))
        x = nn.relu(deconv(32, "d2")(x))
        x = nn.relu(deconv(16, "d3")(x))
        x = deconv(self.channels, "d4")(x).astype(jnp.float32)
        # Output in [0, 1]; crop to the exact target size.
        x = jax.nn.sigmoid(x)
        return x[:, : self.out_hw[0], : self.out_hw[1], :]


class ForwardHead(nn.Module):
    """(state, action) -> next state (forward dynamics loss)."""

    state_dim: int

    @nn.compact
    def __call__(self, s, a):
        x = jnp.concatenate([s, a], axis=-1)
        x = nn.relu(nn.Dense(64, kernel_init=ORTHO)(x))
        return nn.Dense(self.state_dim, kernel_init=ORTHO)(x)


class InverseHead(nn.Module):
    """(state, next state) -> action logits (inverse dynamics loss)."""

    n_actions: int

    @nn.compact
    def __call__(self, s, s_next):
        x = jnp.concatenate([s, s_next], axis=-1)
        x = nn.relu(nn.Dense(64, kernel_init=ORTHO)(x))
        return nn.Dense(self.n_actions, kernel_init=ORTHO)(x)


class RewardHead(nn.Module):
    """(state, next state) -> reward class logits (srl_zoo uses reward
    classification over {-1, 0, 1})."""

    n_classes: int = 3

    @nn.compact
    def __call__(self, s, s_next):
        x = jnp.concatenate([s, s_next], axis=-1)
        x = nn.relu(nn.Dense(64, kernel_init=ORTHO)(x))
        return nn.Dense(self.n_classes, kernel_init=ORTHO)(x)


class SRLModules(nn.Module):
    """Encoder + the heads required by the configured loss set.

    With ``split_dimensions`` set (an ordered (loss, dim) tuple), each head
    reads/writes only its slice of the state vector — the SRLModulesSplit
    semantics the reference resolves from exp_config.json
    (state_representation/models.py:60-92). The encoder always produces the
    full state vector; ``encode`` is the representation served to RL.
    """

    state_dim: int
    losses: Tuple[str, ...]
    image_obs: bool = True
    obs_hw: Tuple[int, int] = (224, 224)
    channels: int = 3
    n_actions: int = 4
    split_dimensions: Tuple[Tuple[str, int], ...] = ()

    def setup(self):
        self.ranges = split_ranges(
            self.losses, self.state_dim, tuple(self.split_dimensions) or None
        )
        if self.image_obs:
            self.encoder = SRLConvEncoder(self.state_dim)
        else:
            self.encoder = SRLMlpEncoder(self.state_dim)
        recon = next(
            (l for l in ("autoencoder", "vae", "dae") if l in self.losses), None
        )
        self._recon = recon
        if "vae" in self.losses:
            a, b = self.ranges["vae"]
            self.log_var_head = nn.Dense(b - a, kernel_init=ORTHO)
        if recon is not None:
            self.decoder = SRLDeconvDecoder(self.obs_hw, self.channels)
        if "forward" in self.losses:
            a, b = self.ranges["forward"]
            self.forward_head = ForwardHead(b - a)
        if "inverse" in self.losses:
            self.inverse_head = InverseHead(self.n_actions)
        if "reward" in self.losses:
            self.reward_head = RewardHead()

    def _slice(self, s, loss):
        a, b = self.ranges[loss]
        return s[..., a:b]

    def encode(self, obs):
        return self.encoder(obs)

    def __call__(self, obs):
        return self.encode(obs)

    def decode(self, s):
        return self.decoder(self._slice(s, self._recon))

    def vae_posterior(self, obs):
        """Returns (mu, log_var) over the vae slice; the encoder output
        doubles as mu."""
        mu = self.encoder(obs)
        # log_var from the same features: reuse mu as features (cheap).
        log_var = self.log_var_head(self._slice(mu, "vae"))
        return mu, log_var

    def predict_forward(self, s, a):
        """Predicts the NEXT forward-slice from the forward-slice + action."""
        return self.forward_head(self._slice(s, "forward"), a)

    def predict_inverse(self, s, s_next):
        return self.inverse_head(
            self._slice(s, "inverse"), self._slice(s_next, "inverse")
        )

    def predict_reward(self, s, s_next):
        return self.reward_head(
            self._slice(s, "reward"), self._slice(s_next, "reward")
        )
