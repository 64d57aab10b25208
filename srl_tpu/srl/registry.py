"""SRL model registry.

Mirrors ``registered_srl`` (state_representation/registry.py:5-30):
name -> (SRLType, env-name restriction, loss set used when training).
"""
from __future__ import annotations

from srl_tpu.core.registry import Registry


def _entry(srl_type, limited_to=None, losses=None):
    return {"type": srl_type, "limited_to": limited_to, "losses": losses or []}


registered_srl: Registry = Registry("srl_model")


def _register_all():
    from srl_tpu.srl import SRLType

    env_modes = {
        "raw_pixels": None,
        "ground_truth": None,
        "joints": ["KukaButtonGymEnv-v0"],
        "joints_position": ["KukaButtonGymEnv-v0"],
    }
    for name, limited in env_modes.items():
        registered_srl.register(name, _entry(SRLType.ENVIRONMENT, limited))

    learned = {
        "robotic_priors": ["priors"],
        "inverse": ["inverse"],
        "forward": ["forward"],
        "multi_view_srl": ["triplet"],
        "srl_combination": ["autoencoder", "inverse", "forward"],
        "supervised": ["supervised"],
        "autoencoder": ["autoencoder"],
        "autoencoder_inverse": ["autoencoder", "inverse"],
        "autoencoder_reward": ["autoencoder", "reward"],
        "autoencoder_forward": ["autoencoder", "forward"],
        "random": [],  # random frozen encoder
        "random_inverse": ["inverse"],
        "reward_inverse": ["reward", "inverse"],
        "srl_splits": ["autoencoder", "inverse", "forward"],
        "srl_split_forward": ["autoencoder", "forward"],
        "srl_3_splits": ["autoencoder", "inverse", "reward"],
        "reward": ["reward"],
        "vae": ["vae"],
        "dae": ["dae"],
        "pca": ["pca"],
    }
    for name, losses in learned.items():
        registered_srl.register(name, _entry(SRLType.SRL, None, losses))


_register_all()
