"""Environment registry.

Mirrors ``registered_env`` (environments/registry.py:41-53): env-id ->
(env class, plotting type, default kwargs). Envs are constructed per-call
because configuration is static (baked into the jitted kernels).
"""
from __future__ import annotations

from enum import Enum

from srl_tpu.core.registry import Registry
from srl_tpu.envs.mobile_robot import (
    MobileRobotEnv,
    MobileRobot1DEnv,
    MobileRobot2TargetEnv,
    MobileRobotLineTargetEnv,
)


class PlottingType(Enum):  # environments/__init__.py
    PLOT_2D = 1
    PLOT_3D = 2


registered_env: Registry = Registry("env")

registered_env.register("MobileRobotGymEnv-v0", (MobileRobotEnv, PlottingType.PLOT_2D))
registered_env.register("MobileRobot1DGymEnv-v0", (MobileRobot1DEnv, PlottingType.PLOT_2D))
registered_env.register(
    "MobileRobot2TargetGymEnv-v0", (MobileRobot2TargetEnv, PlottingType.PLOT_2D)
)
registered_env.register(
    "MobileRobotLineTargetGymEnv-v0", (MobileRobotLineTargetEnv, PlottingType.PLOT_2D)
)


def _register_optional():
    """Envs added as their kernel families land."""
    try:
        from srl_tpu.envs.kuka import (
            KukaButtonEnv,
            KukaRandButtonEnv,
            Kuka2ButtonEnv,
            KukaMovingButtonEnv,
        )

        registered_env.register("KukaButtonGymEnv-v0", (KukaButtonEnv, PlottingType.PLOT_3D))
        registered_env.register(
            "KukaRandButtonGymEnv-v0", (KukaRandButtonEnv, PlottingType.PLOT_3D)
        )
        registered_env.register("Kuka2ButtonGymEnv-v0", (Kuka2ButtonEnv, PlottingType.PLOT_3D))
        registered_env.register(
            "KukaMovingButtonGymEnv-v0", (KukaMovingButtonEnv, PlottingType.PLOT_3D)
        )
    except ImportError:
        pass
    try:
        from srl_tpu.envs.omnirobot import OmniRobotEnv

        registered_env.register("OmnirobotEnv-v0", (OmniRobotEnv, PlottingType.PLOT_2D))
    except ImportError:
        pass
    try:
        from srl_tpu.envs.car_racing import CarRacingEnv

        registered_env.register("CarRacingGymEnv-v0", (CarRacingEnv, PlottingType.PLOT_2D))
    except ImportError:
        pass


_register_optional()


def make_env(env_id: str, **kwargs):
    env_class, _ = registered_env[env_id]
    return env_class(**kwargs)
