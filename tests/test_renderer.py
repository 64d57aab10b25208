"""Batched rasterizer tests for raw_pixels observations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srl_tpu.core.env import VecEnv
from srl_tpu.envs.mobile_robot import (
    MobileRobotEnv,
    MobileRobot1DEnv,
    MobileRobot2TargetEnv,
    MobileRobotLineTargetEnv,
)
from srl_tpu.ops.camera import ground_grid


@pytest.mark.fast
def test_ground_grid_topdown_geometry():
    xy = ground_grid((2, 2, 0), 4.4, 90, -90, 0, 60, 224, 224)
    assert np.isfinite(xy).all()
    # Center pixel maps to the camera target.
    c = xy[112, 112]
    np.testing.assert_allclose(c, [2.0, 2.0], atol=0.05)
    # View spans ±dist*tan(30°) ≈ ±2.54 around the target.
    assert xy[..., 0].min() < -0.3 and xy[..., 0].max() > 4.3


@pytest.mark.fast
def test_render_shapes_and_content():
    env = MobileRobotEnv(srl_model="raw_pixels")
    state = env.reset(jax.random.PRNGKey(0))
    img = np.asarray(jax.jit(env.observe)(state))
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8
    # The scene must contain yellow target pixels, red wall pixels and
    # dark robot pixels.
    yellow = (img[..., 0] > 200) & (img[..., 1] > 200) & (img[..., 2] < 100)
    red = (img[..., 0] > 150) & (img[..., 1] < 80) & (img[..., 2] < 80)
    dark_blue = (img[..., 2] > 60) & (img[..., 0] < 60)
    assert yellow.sum() > 20, "target not rendered"
    assert red.sum() > 100, "red wall not rendered"
    assert dark_blue.sum() > 50, "robot not rendered"


@pytest.mark.fast
def test_render_tracks_robot_position():
    env = MobileRobotEnv(srl_model="raw_pixels")
    state = env.reset(jax.random.PRNGKey(0))
    s1 = state.replace(robot_pos=jnp.array([1.0, 1.0], jnp.float32))
    s2 = state.replace(robot_pos=jnp.array([3.0, 3.0], jnp.float32))
    img1 = np.asarray(env.observe(s1))
    img2 = np.asarray(env.observe(s2))
    assert (img1 != img2).any()

    def robot_centroid(img):
        # Robot body (38,38,89) — distinct from the blue wall (0,0,204).
        mask = (img[..., 2] > 70) & (img[..., 2] < 120) & (img[..., 0] < 60)
        ys, xs = np.nonzero(mask)
        return ys.mean(), xs.mean()

    y1, x1 = robot_centroid(img1)
    y2, x2 = robot_centroid(img2)
    # Moving +x/+y in the world moves the sprite consistently in the image.
    assert abs(y2 - y1) > 20 and abs(x2 - x1) > 20


@pytest.mark.fast
@pytest.mark.parametrize(
    "env_cls", [MobileRobot1DEnv, MobileRobot2TargetEnv, MobileRobotLineTargetEnv]
)
def test_render_variants(env_cls):
    env = env_cls(srl_model="raw_pixels")
    state = env.reset(jax.random.PRNGKey(1))
    img = np.asarray(env.observe(state))
    assert img.shape == (224, 224, 3)
    yellow = (img[..., 0] > 200) & (img[..., 1] > 200) & (img[..., 2] < 100)
    assert yellow.sum() > 20


@pytest.mark.fast
def test_vectorized_pixel_rollout():
    env = MobileRobotEnv(srl_model="raw_pixels")
    vec = VecEnv(env, 4)
    vstate, obs = vec.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 224, 224, 3)
    step = jax.jit(vec.step)
    vstate, tr = step(vstate, jnp.zeros(4, jnp.int32))
    assert tr.obs.shape == (4, 224, 224, 3) and tr.obs.dtype == jnp.uint8


@pytest.mark.fast
def test_fpv_second_camera():
    """fpv=True stacks a genuine first-person render (6 channels), not a
    duplicate of the top-down view (mobile_robot_env.py:315-332)."""
    env = MobileRobotEnv(srl_model="raw_pixels", fpv=True)
    state = env.reset(jax.random.PRNGKey(3))
    img = np.asarray(env.observe(state))
    assert img.shape == (224, 224, 6)
    top, fpv = img[..., :3], img[..., 3:]
    assert not np.array_equal(top, fpv)
    # Perspective view: sky at the top of the frame, ground at the bottom.
    sky = np.array([179, 199, 230])
    assert (np.abs(fpv[0, :, :].astype(int) - sky).max(axis=-1) < 60).mean() > 0.9
    # The view tracks the robot: moving the robot changes the image.
    import jax.numpy as jnp

    s2 = state.replace(robot_pos=state.robot_pos + jnp.asarray([0.5, 0.5]))
    fpv2 = np.asarray(env.observe(s2))[..., 3:]
    assert (fpv2 != fpv).any()
