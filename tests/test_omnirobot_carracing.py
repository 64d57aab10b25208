"""Omnirobot + CarRacing env tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srl_tpu.core.env import VecEnv
from srl_tpu.envs.omnirobot import (
    OmniRobotEnv, RingBox, STEP_DISTANCE, MAX_X, DIST_TO_TARGET_THRESHOLD,
)
from srl_tpu.envs.car_racing import CarRacingEnv, N_TILES, TRACK_WIDTH, PLAYFIELD


@pytest.mark.fast
def test_omnirobot_registered():
    from srl_tpu.envs.registry import registered_env

    assert "OmnirobotEnv-v0" in registered_env
    assert "CarRacingGymEnv-v0" in registered_env


@pytest.mark.fast
def test_omnirobot_moves_and_bump():
    env = OmniRobotEnv(srl_model="ground_truth", random_target=True)
    state = env.reset(jax.random.PRNGKey(0))
    p0 = np.asarray(state.robot_pos)
    state, r, d = env.step(state, jnp.int32(0))  # FORWARD +x
    np.testing.assert_allclose(
        np.asarray(state.robot_pos), p0 + [STEP_DISTANCE, 0], atol=1e-6
    )
    # Drive into the +x wall.
    state = state.replace(robot_pos=jnp.array([0.8, 0.0], jnp.float32))
    state, r, d = env.step(state, jnp.int32(0))
    assert float(r) == -1.0
    np.testing.assert_allclose(np.asarray(state.robot_pos), [0.8, 0.0])


@pytest.mark.fast
def test_omnirobot_reach_reward_and_truncation():
    env = OmniRobotEnv(srl_model="ground_truth")
    state = env.reset(jax.random.PRNGKey(1))
    state = state.replace(
        robot_pos=state.target_pos + jnp.array([0.05, 0.0]),
    )
    state, r, _ = env.step(state, jnp.int32(4 - 4))  # any move keeps it close
    assert float(r) == 1.0
    # Truncation at step_count > 250.
    state = state.replace(step_count=jnp.int32(250))
    state, r, d = env.step(state, jnp.int32(0))
    assert bool(d)


@pytest.mark.fast
def test_omnirobot_continuous_ringbox():
    env = OmniRobotEnv(srl_model="ground_truth", is_discrete=False)
    space = env.action_space
    assert isinstance(space, RingBox)
    s = np.asarray(space.sample(jax.random.PRNGKey(0)))
    assert (np.abs(s) <= 0.1 + 1e-6).all()
    state = env.reset(jax.random.PRNGKey(2))
    p0 = np.asarray(state.robot_pos)
    state, r, _ = env.step(state, jnp.array([0.05, -0.03]))
    np.testing.assert_allclose(
        np.asarray(state.robot_pos), p0 + [0.05, -0.03], atol=1e-6
    )


@pytest.mark.fast
def test_omnirobot_expert_policy_reaches():
    env = OmniRobotEnv(srl_model="ground_truth")
    state = env.reset(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    policy = jax.jit(env.actionPolicyTowardTarget)
    for _ in range(60):
        a = policy(state)
        state, r, d = step(state, a)
        if float(r) == 1.0:
            break
    assert float(r) == 1.0, "expert policy failed to reach the target"


@pytest.mark.fast
def test_omnirobot_render():
    env = OmniRobotEnv(srl_model="raw_pixels")
    state = env.reset(jax.random.PRNGKey(0))
    img = np.asarray(jax.jit(env.observe)(state))
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8
    red = (img[..., 0] > 180) & (img[..., 1] < 80)
    dark = img.max(axis=-1) < 40
    assert red.sum() > 20, "target marker missing"
    assert dark.sum() > 50, "robot marker missing"


@pytest.mark.fast
def test_carracing_track_and_dynamics():
    env = CarRacingEnv(srl_model="ground_truth")
    state = env.reset(jax.random.PRNGKey(0))
    track = np.asarray(state.track)
    assert track.shape == (N_TILES, 2)
    # Track is a closed loop with reasonable spacing.
    gaps = np.linalg.norm(np.roll(track, -1, 0) - track, axis=1)
    assert gaps.max() < 20.0
    # Full throttle along the track accumulates tile rewards.
    step = jax.jit(env.step)
    total = 0.0
    for _ in range(100):
        state, r, d = step(state, jnp.int32(2))  # gas
        total += float(r)
    assert float(jnp.linalg.norm(state.vel)) > 1.0, "car never moved"
    assert total > -10.0, "no tiles visited while driving forward"
    gt = np.asarray(env.ground_truth(state))
    assert gt.shape == (5,)


@pytest.mark.fast
def test_carracing_out_of_field_penalty():
    env = CarRacingEnv(srl_model="ground_truth")
    state = env.reset(jax.random.PRNGKey(1))
    state = state.replace(pos=jnp.array([PLAYFIELD + 10.0, 0.0]))
    state, r, d = env.step(state, jnp.int32(3))
    assert bool(d) and float(r) == -100.0


@pytest.mark.fast
def test_carracing_render_and_vec():
    env = CarRacingEnv(srl_model="raw_pixels")
    vec = VecEnv(env, 2)
    vstate, obs = vec.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 224, 224, 3)
    img = np.asarray(obs[0])
    gray = (abs(img[..., 0].astype(int) - 102) < 15) & (
        abs(img[..., 1].astype(int) - 102) < 15
    )
    assert gray.sum() > 500, "track not rendered"
