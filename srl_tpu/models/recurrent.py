"""Recurrent (LSTM) actor-critic policies.

The reference selects lstm/lnlstm/cnnlstm/cnnlnlstm stable-baselines policies
(base_classes.py:227-246); here: torso (mlp|cnn) -> LSTMCell (optionally
layer-normalized) -> pi/vf heads. Hidden state is carried through the scan
rollout and zeroed on episode boundaries (the `done` mask), matching
stable-baselines' recurrent policy semantics.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from srl_tpu.core.spaces import Discrete, Space
from srl_tpu.models.distributions import Categorical, DiagGaussian
from srl_tpu.models.policies import MlpTorso, NatureCnnTorso, _dense


class LstmActorCritic(nn.Module):
    action_space: Space
    torso: str = "mlp"  # "mlp" | "cnn"
    n_lstm: int = 64
    layer_norm: bool = False  # lnlstm variants

    def setup(self):
        self.features = MlpTorso() if self.torso == "mlp" else NatureCnnTorso()
        self.cell = nn.OptimizedLSTMCell(self.n_lstm)
        if self.layer_norm:
            self.ln = nn.LayerNorm()
        self.vf = _dense(1, scale=1.0, name="vf")
        if isinstance(self.action_space, Discrete):
            self.pi = _dense(self.action_space.n, scale=0.01, name="pi")
        else:
            act_dim = int(np.prod(self.action_space.shape))
            self.pi = _dense(act_dim, scale=0.01, name="pi")
            self.log_std = self.param(
                "log_std", nn.initializers.zeros, (act_dim,)
            )

    def initial_state(self, batch: int):
        zeros = jnp.zeros((batch, self.n_lstm), jnp.float32)
        return (zeros, zeros)

    def __call__(self, obs, lstm_state, done):
        """One step: obs [B, ...], lstm_state ((B,H),(B,H)), done [B]."""
        x = self.features(obs)
        mask = (1.0 - done.astype(jnp.float32))[:, None]
        lstm_state = (lstm_state[0] * mask, lstm_state[1] * mask)
        lstm_state, h = self.cell(lstm_state, x)
        if self.layer_norm:
            h = self.ln(h)
        value = self.vf(h)[..., 0]
        if isinstance(self.action_space, Discrete):
            dist = Categorical(logits=self.pi(h))
        else:
            mean = self.pi(h)
            dist = DiagGaussian(
                mean=mean, log_std=jnp.broadcast_to(self.log_std, mean.shape)
            )
        return dist, value, lstm_state


def make_recurrent_policy(action_space: Space, policy: str) -> LstmActorCritic:
    """'lstm'|'lnlstm'|'cnnlstm'|'cnnlnlstm' -> module."""
    torso = "cnn" if policy.startswith("cnn") else "mlp"
    layer_norm = "lnlstm" in policy
    return LstmActorCritic(
        action_space=action_space, torso=torso, layer_norm=layer_norm
    )
