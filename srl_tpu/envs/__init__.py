from srl_tpu.envs.mobile_robot import (
    MobileRobotEnv,
    MobileRobot1DEnv,
    MobileRobot2TargetEnv,
    MobileRobotLineTargetEnv,
)
from srl_tpu.envs.kuka import (
    KukaButtonEnv,
    KukaRandButtonEnv,
    Kuka2ButtonEnv,
    KukaMovingButtonEnv,
)
from srl_tpu.envs.registry import registered_env, make_env

__all__ = [
    "MobileRobotEnv",
    "MobileRobot1DEnv",
    "MobileRobot2TargetEnv",
    "MobileRobotLineTargetEnv",
    "KukaButtonEnv",
    "KukaRandButtonEnv",
    "Kuka2ButtonEnv",
    "KukaMovingButtonEnv",
    "registered_env",
    "make_env",
]
