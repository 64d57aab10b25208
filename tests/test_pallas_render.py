"""Pallas renderer kernel: bit-parity with the XLA path (interpret mode on
the CPU test platform; the same check passed on real TPU hardware)."""
import jax
import numpy as np
import pytest

from srl_tpu.envs.mobile_robot import (
    MobileRobotEnv,
    MobileRobot2TargetEnv,
    MobileRobotLineTargetEnv,
)
from srl_tpu.ops.pallas_render import render_mobile_robot_pallas


@pytest.mark.fast
@pytest.mark.parametrize(
    "env_cls", [MobileRobotEnv, MobileRobot2TargetEnv, MobileRobotLineTargetEnv]
)
def test_pallas_render_matches_xla(env_cls):
    env = env_cls(srl_model="raw_pixels")
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    states = jax.vmap(env.reset)(keys)
    ref = np.asarray(jax.vmap(env.render_pixels)(states))
    pal = np.asarray(render_mobile_robot_pallas(env, states))
    np.testing.assert_array_equal(ref, pal)
