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


@pytest.mark.parametrize("variant", ["button", "rand", "2button"])
def test_pallas_kuka_render_matches_xla(variant):
    """The Pallas tile ray-tracer renders the same Kuka scene as the XLA
    lowering (ops/renderer3d.py). Not bit-exact — min/compare reassociation
    flips a handful of silhouette-edge pixels — so assert the off-edge
    agreement instead."""
    from srl_tpu.envs.kuka import Kuka2ButtonEnv, KukaButtonEnv, KukaRandButtonEnv
    from srl_tpu.ops.pallas_render3d import render_kuka_pallas
    from srl_tpu.ops.renderer3d import render_kuka

    env_cls = {
        "button": KukaButtonEnv,
        "rand": KukaRandButtonEnv,
        "2button": Kuka2ButtonEnv,
    }[variant]
    env = env_cls(srl_model="raw_pixels")
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    states = jax.vmap(env.reset)(keys)
    ref = np.asarray(jax.vmap(lambda s: render_kuka(env, s))(states))
    pal = np.asarray(render_kuka_pallas(env, states))
    assert ref.shape == pal.shape
    diff = np.abs(ref.astype(int) - pal.astype(int))
    assert (diff == 0).mean() > 0.995, f"pixel agreement too low: {(diff==0).mean()}"
    assert (diff > 2).mean() < 0.005


def test_pallas_kuka_fullres_scale1():
    """render_scale=1 keeps the exact full-resolution trace on both paths
    (the coarse default is render_scale=2; the exact path must not rot)."""
    from srl_tpu.envs.kuka import KukaButtonEnv
    from srl_tpu.ops.pallas_render3d import render_kuka_pallas
    from srl_tpu.ops.renderer3d import render_kuka

    env = KukaButtonEnv(srl_model="raw_pixels", render_scale=1)
    states = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(3), 2))
    ref = np.asarray(jax.vmap(lambda s: render_kuka(env, s))(states))
    pal = np.asarray(render_kuka_pallas(env, states))
    assert ref.shape == pal.shape == (2, 224, 224, 3)
    diff = np.abs(ref.astype(int) - pal.astype(int))
    assert (diff == 0).mean() > 0.995
    # And the coarse trace approximates the exact one (scene structure
    # intact, only silhouette edges differ).
    env2 = KukaButtonEnv(srl_model="raw_pixels", render_scale=2)
    coarse = np.asarray(jax.vmap(lambda s: render_kuka(env2, s))(states))
    assert (np.abs(coarse.astype(int) - ref.astype(int)) <= 8).mean() > 0.9


@pytest.mark.fast
def test_pallas_kuka_multiview():
    from srl_tpu.envs.kuka import KukaButtonEnv
    from srl_tpu.ops.pallas_render3d import render_kuka_pallas

    env = KukaButtonEnv(srl_model="raw_pixels", multi_view=True)
    states = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(2), 2))
    out = np.asarray(render_kuka_pallas(env, states))
    assert out.shape == (2, 224, 224, 6)
    # The two views differ (different cameras).
    assert (out[..., :3] != out[..., 3:]).mean() > 0.1
