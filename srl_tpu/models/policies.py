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


class _Conv1(nn.Module):
    """conv1 of the Nature CNN with an optional fused 2x nearest-upsample.

    Parameters are ALWAYS the full-resolution [8, 8, C, 32] kernel (same
    names/shapes as the plain ``nn.Conv`` it replaces, so checkpoints
    interchange). With ``input_scale=2`` the input is the COARSE half-res
    image and the layer exploits the exact identity

        conv(upsample2x(x), k=8, s=4) == conv(x, k'=4, s=2)
        with k'[m, n] = sum of k[2m+{0,1}, 2n+{0,1}]

    (each output pixel of the strided conv reads every coarse pixel through
    the 2x2 block of duplicated samples), so the [*, 224, 224, C] upsampled
    image — and its multi-GB bf16 HLO temps in minibatch updates — never
    exists. Gradients flow through the block-sum back to the full kernel."""

    input_scale: int = 1

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.orthogonal(ORTHO_GAIN), (8, 8, x.shape[-1], 32)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (32,))
        if self.input_scale == 1:
            k, strides = kernel, (4, 4)
        else:
            assert self.input_scale == 2, "only 2x fused upsample supported"
            k = kernel.reshape(4, 2, 4, 2, x.shape[-1], 32).sum(axis=(1, 3))
            strides = (2, 2)
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), window_strides=strides, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(x.dtype)


class NatureCnnTorso(nn.Module):
    """Nature-DQN CNN (stable-baselines CnnPolicy): 32x8s4, 64x4s2, 64x3s1,
    fc512. Input: uint8 HWC images, scaled by /255 on device; conv compute in
    bfloat16 for the MXU. ``input_scale=2`` consumes half-resolution images
    with the 2x upsample folded into conv1 (see _Conv1); all downstream
    shapes and parameters are identical to the full-resolution torso."""

    input_scale: int = 1

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
        x = nn.relu(_Conv1(input_scale=self.input_scale, name="c1")(x))
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
    input_scale: int = 1  # cnn only: coarse-obs factor folded into conv1

    @nn.compact
    def __call__(self, obs):
        torso = (MlpTorso() if self.torso == "mlp"
                 else NatureCnnTorso(input_scale=self.input_scale))
        latent = torso(obs)
        value = _dense(1, scale=1.0, name="vf")(latent)[..., 0]
        if isinstance(self.action_space, Discrete):
            logits = _dense(self.action_space.n, scale=0.01, name="pi")(latent)
            return Categorical(logits=logits), value
        act_dim = int(np.prod(self.action_space.shape))
        mean = _dense(act_dim, scale=0.01, name="pi")(latent)
        log_std = self.param("log_std", nn.initializers.zeros, (act_dim,))
        return DiagGaussian(mean=mean, log_std=jnp.broadcast_to(log_std, mean.shape)), value


def make_policy(action_space: Space, obs_shape, policy: str = "mlp",
                input_scale: int = 1) -> ActorCritic:
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
    return ActorCritic(action_space=action_space, torso=torso,
                       input_scale=input_scale if torso == "cnn" else 1)
