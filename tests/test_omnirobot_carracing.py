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
def test_carracing_tile_reward_totals_1000():
    """Gym CarRacing's friction-detector scheme: visiting every tile pays
    exactly TILE_REWARD_TOTAL=1000 in tile rewards, −0.1 per step
    (inherited by the wrapper, car_env.py:139-146)."""
    from srl_tpu.envs.car_racing import TILE_REWARD_TOTAL

    env = CarRacingEnv(srl_model="ground_truth")
    state = env.reset(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    track = np.asarray(state.track)
    total_tile_reward, steps = 0.0, 0
    # Teleport the car over each tile and take a no-op step: every tile is
    # marked visited exactly once.
    for i in range(N_TILES):
        state = state.replace(pos=jnp.asarray(track[i]))
        state, r, d = step(state, jnp.int32(3))
        steps += 1
        total_tile_reward += float(r) + 0.1
        if bool(d) and i < N_TILES - 1:
            break
    np.testing.assert_allclose(total_tile_reward, TILE_REWARD_TOTAL, atol=1e-3)
    assert bool(np.all(np.asarray(state.visited)))


@pytest.mark.fast
def test_carracing_step_penalty_off_track():
    """Off the track (but in the field) the per-step reward is exactly -0.1."""
    env = CarRacingEnv(srl_model="ground_truth")
    state = env.reset(jax.random.PRNGKey(3))
    # A spot inside the playfield but far from every tile.
    track = np.asarray(state.track)
    corner = jnp.array([PLAYFIELD * 0.95, PLAYFIELD * 0.95])
    assert np.min(np.linalg.norm(track - np.asarray(corner), axis=1)) > TRACK_WIDTH
    state = state.replace(pos=corner, vel=jnp.zeros(2))
    state, r, d = env.step(state, jnp.int32(3))  # brake
    np.testing.assert_allclose(float(r), -0.1, atol=1e-6)
    assert not bool(d)


@pytest.mark.fast
def test_carracing_track_generation_statistics():
    """Track generator anchored to gym CarRacing's: 12 noisy checkpoints on
    a circle with radii in [TRACK_RAD/3, TRACK_RAD], first checkpoint pinned
    at angle 0, smoothed into a closed loop that stays inside the playfield
    (gym car_racing._create_track semantics with a static tile count)."""
    from srl_tpu.envs.car_racing import TRACK_RAD

    env = CarRacingEnv(srl_model="ground_truth")
    for seed in range(12):
        track = np.asarray(env.reset(jax.random.PRNGKey(seed)).track)
        assert track.shape == (N_TILES, 2)
        # Closed loop: circular gaps all small and uniform-ish.
        gaps = np.linalg.norm(np.roll(track, -1, 0) - track, axis=1)
        assert gaps.max() < 6.0, gaps.max()
        assert gaps.max() < 12 * max(gaps.min(), 1e-3)
        # Inside the playfield with margin.
        assert np.abs(track).max() < PLAYFIELD * 0.9
        # Radii within the gym sampling band (smoothing only shrinks).
        radii = np.linalg.norm(track, axis=1)
        assert radii.max() <= TRACK_RAD + 1e-3
        assert radii.min() >= TRACK_RAD / 3 * 0.3
        # The loop encircles the origin (sum of winding angles = 2 pi).
        ang = np.unwrap(np.arctan2(track[:, 1], track[:, 0]))
        winding = ang[-1] - ang[0] + (ang[0] - ang[-1] + 2 * np.pi) % (2 * np.pi)
        assert abs(np.ptp(ang) - 2 * np.pi) < np.pi, "not a single loop"


@pytest.mark.fast
def test_carracing_action_mapping_parity():
    """Discrete action 0 (steer left: steer=-1) must match the continuous
    action [+1, 0, 0] — the wrapper NEGATES continuous steer
    (car_env.py:122-131)."""
    env_d = CarRacingEnv(srl_model="ground_truth", is_discrete=True)
    env_c = CarRacingEnv(srl_model="ground_truth", is_discrete=False)
    sd = env_d.reset(jax.random.PRNGKey(4))
    sc = env_c.reset(jax.random.PRNGKey(4))
    # Give both some forward speed first (gas / [0,1,0]).
    for _ in range(20):
        sd, _, _ = env_d.step(sd, jnp.int32(2))
        sc, _, _ = env_c.step(sc, jnp.asarray([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(sd.pos), np.asarray(sc.pos), atol=1e-4)
    for _ in range(10):
        sd, _, _ = env_d.step(sd, jnp.int32(0))
        sc, _, _ = env_c.step(sc, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(
        float(sd.wheel_angle), float(sc.wheel_angle), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(sd.yaw), np.asarray(sc.yaw), atol=1e-4)


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
