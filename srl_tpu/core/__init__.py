from srl_tpu.core.spaces import Box, Discrete, Space
from srl_tpu.core.env import TpuEnv, Transition, VecEnv, VecEnvState
from srl_tpu.core.registry import Registry

__all__ = [
    "Box",
    "Discrete",
    "Space",
    "TpuEnv",
    "Transition",
    "VecEnv",
    "VecEnvState",
    "Registry",
]
