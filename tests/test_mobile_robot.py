"""Golden-trajectory and vectorization tests for the MobileRobot kernels."""
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
    MAX_X,
    MAX_Y,
)

from .oracle_mobile_robot import OracleMobileRobot


def rollout_jax(env, state, actions):
    step = jax.jit(env.step)
    traj, rewards, dones = [], [], []
    for a in actions:
        state, r, d = step(state, a)
        traj.append(np.asarray(state.robot_pos))
        rewards.append(float(r))
        dones.append(bool(d))
    return np.array(traj), np.array(rewards), np.array(dones)


def rollout_oracle(oracle, actions):
    traj, rewards, dones = [], [], []
    for a in actions:
        pos, r, d = oracle.step(a)
        traj.append(pos)
        rewards.append(float(r))
        dones.append(bool(d))
    return np.array(traj), np.array(rewards), np.array(dones)


@pytest.mark.fast
@pytest.mark.parametrize(
    "env_cls,kwargs,oracle_kwargs",
    [
        (MobileRobotEnv, {}, dict(dim=2)),
        (MobileRobot1DEnv, {}, dict(dim=1)),
        (MobileRobot2TargetEnv, {}, dict(n_targets=2, max_steps=1500)),
        (MobileRobotLineTargetEnv, {}, dict(line_target=True)),
        (MobileRobotEnv, dict(shape_reward=True), dict(dim=2, shape_reward=True)),
        (MobileRobotEnv, dict(is_discrete=False), dict(dim=2, is_discrete=False)),
        (MobileRobotEnv, dict(random_target=True), dict(dim=2)),
    ],
)
def test_golden_trajectory_vs_oracle(env_cls, kwargs, oracle_kwargs):
    """JAX kernel trajectories match a float32 numpy transliteration of the
    reference dynamics bit-for-bit from identical initial conditions."""
    env = env_cls(**kwargs)
    key = jax.random.PRNGKey(42)
    state = env.reset(key)

    rng = np.random.RandomState(0)
    n = 300
    if env.is_discrete:
        n_act = env.action_space.n
        actions = list(rng.randint(0, n_act, size=n))
    else:
        actions = [a.astype(np.float32) for a in rng.uniform(-1.2, 1.2, size=(n, 2))]

    oracle = OracleMobileRobot(**oracle_kwargs)
    oracle.set_state(np.asarray(state.robot_pos), np.asarray(state.targets))

    jt, jr, jd = rollout_jax(env, state, actions)
    ot, orew, od = rollout_oracle(oracle, actions)

    if env.is_discrete:
        # Discrete deltas are exact float32 adds: bit-exact.
        np.testing.assert_array_equal(jt, ot)
    else:
        # XLA fuses prev + act*dv into an FMA; allow 1 ULP vs numpy.
        np.testing.assert_allclose(jt, ot, atol=5e-7)
    np.testing.assert_allclose(jr, orew, atol=1e-6)
    np.testing.assert_array_equal(jd, od)


@pytest.mark.fast
def test_reset_distributions():
    env = MobileRobotEnv(random_target=True)
    keys = jax.random.split(jax.random.PRNGKey(0), 512)
    states = jax.vmap(env.reset)(keys)
    pos = np.asarray(states.robot_pos)
    # Robot starts in the central third (mobile_robot_env.py:168-170).
    assert (pos >= MAX_X / 2 - MAX_X / 3 - 1e-6).all()
    assert (pos <= MAX_X / 2 + MAX_X / 3 + 1e-6).all()
    tgt = np.asarray(states.targets)
    assert (tgt >= 0.4 - 1e-6).all() and (tgt <= 3.6 + 1e-6).all()
    # Randomization actually varies.
    assert np.std(pos[:, 0]) > 0.1 and np.std(tgt[:, 0, 0]) > 0.1


@pytest.mark.fast
def test_determinism_same_key():
    env = MobileRobotEnv()
    s1 = env.reset(jax.random.PRNGKey(7))
    s2 = env.reset(jax.random.PRNGKey(7))
    assert np.array_equal(np.asarray(s1.robot_pos), np.asarray(s2.robot_pos))
    s1b, r1, _ = env.step(s1, jnp.int32(1))
    s2b, r2, _ = env.step(s2, jnp.int32(1))
    assert np.array_equal(np.asarray(s1b.robot_pos), np.asarray(s2b.robot_pos))


@pytest.mark.fast
def test_episode_truncation_length():
    """Episode ends when step_count > max_steps: length = max_steps + 1
    (mobile_robot_env.py:336-343 checks after increment)."""
    env = MobileRobotEnv()
    vec = VecEnv(env, 4)
    vstate, obs = vec.reset(jax.random.PRNGKey(0))

    @jax.jit
    def run(vstate):
        def body(vs, _):
            vs, tr = vec.step(vs, jnp.zeros(4, jnp.int32) + 2)
            return vs, (tr.done, tr.episode_length)

        return jax.lax.scan(body, vstate, None, length=600)

    _, (dones, lengths) = run(vstate)
    dones = np.asarray(dones)
    lengths = np.asarray(lengths)
    assert dones.sum() >= 4
    assert (lengths[dones] == 251).all()
    # Done exactly at step 251 and 502 of the scan for all envs.
    assert dones[250].all() and dones[501].all()
    assert not dones[:250].any()


@pytest.mark.fast
def test_autoreset_gives_fresh_obs():
    env = MobileRobotEnv()
    vec = VecEnv(env, 8)
    vstate, obs = vec.reset(jax.random.PRNGKey(3))
    step = jax.jit(vec.step)
    # Drive to termination.
    for _ in range(251):
        vstate, tr = step(vstate, jnp.zeros(8, jnp.int32))
    assert np.asarray(tr.done).all()
    # After autoreset the step counters are back at 0 and positions re-sampled
    # in the central third.
    assert (np.asarray(vstate.env_state.step_count) == 0).all()
    pos = np.asarray(vstate.env_state.robot_pos)
    assert (pos[:, 0] >= MAX_X / 6 - 1e-6).all()


@pytest.mark.fast
def test_two_target_progression():
    env = MobileRobot2TargetEnv()
    state = env.reset(jax.random.PRNGKey(1))
    # Teleport the robot next to target 0.
    state = state.replace(robot_pos=state.targets[0] + jnp.array([0.05, 0.0]))
    state, r, _ = env.step(state, jnp.int32(0))
    assert float(r) == 1.0
    assert int(state.current_target) == 1
    # Reaching target 1 keeps index at 1 (no wraparound,
    # mobile_robot_2target_env.py:170-173).
    state = state.replace(robot_pos=state.targets[1] + jnp.array([0.05, 0.0]))
    state, r, _ = env.step(state, jnp.int32(1))
    assert float(r) == 1.0
    assert int(state.current_target) == 1


@pytest.mark.fast
def test_bump_rollback_and_penalty():
    env = MobileRobotEnv()
    state = env.reset(jax.random.PRNGKey(2))
    # Place the robot at the x margin; moving -x must bump.
    state = state.replace(robot_pos=jnp.array([0.43, 2.0], jnp.float32))
    new_state, r, _ = env.step(state, jnp.int32(0))  # action 0 = -dx
    assert float(r) == -1.0
    np.testing.assert_array_equal(
        np.asarray(new_state.robot_pos), np.asarray(state.robot_pos)
    )


@pytest.mark.fast
def test_srl_state_relative():
    env = MobileRobotEnv()
    state = env.reset(jax.random.PRNGKey(5))
    obs = env.observe(state)
    expected = np.asarray(state.robot_pos) - np.asarray(state.targets[0])
    np.testing.assert_allclose(np.asarray(obs), expected, atol=1e-7)
    assert obs.shape == env.observation_space.shape

    line = MobileRobotLineTargetEnv()
    lstate = line.reset(jax.random.PRNGKey(5))
    lobs = line.observe(lstate)
    assert lobs.shape == (2,)  # gt(2) - target(1) broadcast quirk preserved


@pytest.mark.fast
def test_scan_rollout_compiles_once_and_runs():
    env = MobileRobotEnv()
    vec = VecEnv(env, 64)
    vstate, obs = vec.reset(jax.random.PRNGKey(0))

    @jax.jit
    def rollout(vstate, key):
        def body(carry, _):
            vs, k = carry
            k, sub = jax.random.split(k)
            actions = jax.random.randint(sub, (64,), 0, 4)
            vs, tr = vec.step(vs, actions)
            return (vs, k), tr.reward

        (vstate, _), rewards = jax.lax.scan(
            body, (vstate, key), None, length=128
        )
        return vstate, rewards

    vstate, rewards = rollout(vstate, jax.random.PRNGKey(9))
    assert rewards.shape == (128, 64)
    assert np.isfinite(np.asarray(rewards)).all()
