"""Actor-critic policy networks (Flax).

TPU-native replacements for the stable-baselines TF1 policies selected by
``StableBaselinesRLObject.train`` (base_classes.py:227-246): ``mlp`` (2x64
tanh), ``cnn`` (Nature CNN). Convolutions run in bfloat16 on the MXU with
float32 params/outputs.
"""
from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from srl_tpu.core.spaces import Box, Discrete, Space
from srl_tpu.models.distributions import Categorical, DiagGaussian

ORTHO_GAIN = float(np.sqrt(2))


def _dense(features, scale=ORTHO_GAIN, name=None):
    return nn.Dense(
        features,
        kernel_init=nn.initializers.orthogonal(scale),
        bias_init=nn.initializers.zeros_init(),
        name=name,
    )


class MlpTorso(nn.Module):
    """Two 64-unit tanh layers (stable-baselines MlpPolicy net_arch)."""

    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, x):
        x = x.reshape((x.shape[0], -1))
        for i, h in enumerate(self.hidden):
            x = jnp.tanh(_dense(h, name=f"fc{i}")(x))
        return x


class NatureCnnTorso(nn.Module):
    """Nature-DQN CNN (stable-baselines CnnPolicy): 32x8s4, 64x4s2, 64x3s1,
    fc512. Input: uint8 HWC images, scaled by /255 on device; conv compute in
    bfloat16 for the MXU."""

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32) / 255.0
        x = x.astype(jnp.bfloat16)
        conv = lambda f, k, s, name: nn.Conv(
            f,
            (k, k),
            strides=(s, s),
            padding="VALID",
            kernel_init=nn.initializers.orthogonal(ORTHO_GAIN),
            dtype=jnp.bfloat16,
            name=name,
        )
        x = nn.relu(conv(32, 8, 4, "c1")(x))
        x = nn.relu(conv(64, 4, 2, "c2")(x))
        x = nn.relu(conv(64, 3, 1, "c3")(x))
        x = x.reshape((x.shape[0], -1))
        # fc512 is the single largest matmul in the net ([B, 36864] x
        # [36864, 512] at 224x224 input) — keep it on the MXU in bf16 like
        # the convs; params and the torso output stay float32.
        x = nn.relu(nn.Dense(
            512,
            kernel_init=nn.initializers.orthogonal(ORTHO_GAIN),
            bias_init=nn.initializers.zeros_init(),
            dtype=jnp.bfloat16,
            name="fc",
        )(x)).astype(jnp.float32)
        return x


class ActorCritic(nn.Module):
    """Shared-torso actor-critic head over a Discrete or Box action space."""

    action_space: Space
    torso: str = "mlp"  # "mlp" | "cnn"

    @nn.compact
    def __call__(self, obs):
        torso = MlpTorso() if self.torso == "mlp" else NatureCnnTorso()
        latent = torso(obs)
        value = _dense(1, scale=1.0, name="vf")(latent)[..., 0]
        if isinstance(self.action_space, Discrete):
            logits = _dense(self.action_space.n, scale=0.01, name="pi")(latent)
            return Categorical(logits=logits), value
        act_dim = int(np.prod(self.action_space.shape))
        mean = _dense(act_dim, scale=0.01, name="pi")(latent)
        log_std = self.param("log_std", nn.initializers.zeros, (act_dim,))
        return DiagGaussian(mean=mean, log_std=jnp.broadcast_to(log_std, mean.shape)), value


def make_policy(action_space: Space, obs_shape, policy: str = "mlp") -> ActorCritic:
    """Policy factory mirroring the cnn/mlp selection in
    base_classes.py:227-246. Recurrent kinds (lstm/lnlstm/cnnlstm) live in
    ``models.recurrent`` behind the Recurrent* agent classes
    (agents.registry.resolve_policy_class) — building them here would
    silently drop the recurrence, so they raise instead."""
    if "lstm" in policy:
        raise ValueError(
            f"policy '{policy}' is recurrent — load/construct the agent via "
            "agents.registry.resolve_policy_class so the Recurrent* "
            "implementation (models.recurrent) is used"
        )
    if policy == "cnn" or (policy == "auto" and len(obs_shape) == 3):
        torso = "cnn"
    elif policy in ("mlp", "auto"):
        torso = "mlp"
    else:
        raise ValueError(f"unknown policy kind '{policy}' (mlp|cnn|auto)")
    return ActorCritic(action_space=action_space, torso=torso)
