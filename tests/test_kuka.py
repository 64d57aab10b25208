"""Kuka env family: kinematics, contacts, rewards, termination."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srl_tpu.core.env import VecEnv
from srl_tpu.envs.kuka import (
    KukaButtonEnv,
    Kuka2ButtonEnv,
    KukaMovingButtonEnv,
    KukaRandButtonEnv,
    Z_TABLE,
    BUTTON_DISTANCE_HEIGHT,
    BUTTON_YMAX,
)
from srl_tpu.ops import kinematics as kin


@pytest.mark.fast
def test_fk_settled_matches_rest_target():
    q = jnp.asarray(kin.settled_rest_q())
    _, _, R, p_flange, p_tip = kin.fk(q)
    np.testing.assert_allclose(
        np.asarray(p_flange), kin.REST_EE_TARGET, atol=1e-3
    )
    # Down-pointing orientation preserved.
    np.testing.assert_allclose(np.asarray(R[:, 2]), [0, 0, -1], atol=1e-2)


@pytest.mark.fast
def test_ik_tracks_moving_target():
    q = jnp.asarray(kin.settled_rest_q())
    step = jax.jit(kin.control_step)
    target = jnp.array([0.6, 0.15, 0.2], jnp.float32)
    for _ in range(3000):
        q = step(q, target)
    p_flange = kin.fk(q)[3]
    np.testing.assert_allclose(np.asarray(p_flange), np.asarray(target), atol=5e-3)


@pytest.mark.fast
def test_reset_and_spaces():
    env = KukaButtonEnv(srl_model="ground_truth")
    state = env.reset(jax.random.PRNGKey(0))
    obs = env.observe(state)
    assert obs.shape == (3,)
    # Relative ground truth: tip - button_top.
    tip = kin.fk(state.q)[4]
    np.testing.assert_allclose(
        np.asarray(obs), np.asarray(tip - state.buttons[0]), atol=1e-6
    )
    assert env.action_space.n == 6

    jenv = KukaButtonEnv(srl_model="joints")
    jobs = jenv.observe(jenv.reset(jax.random.PRNGKey(0)))
    assert jobs.shape == (14,)
    jp = KukaButtonEnv(srl_model="joints_position")
    assert jp.observe(jp.reset(jax.random.PRNGKey(0))).shape == (17,)


@pytest.mark.fast
def test_reset_randomization_differs():
    env = KukaButtonEnv(srl_model="ground_truth", random_target=True)
    s1 = env.reset(jax.random.PRNGKey(1))
    s2 = env.reset(jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(s1.buttons), np.asarray(s2.buttons))
    assert not np.allclose(np.asarray(s1.ee_target), np.asarray(s2.ee_target))
    # Buttons within the randomization box (kuka_button_gym_env.py:227-231).
    b = np.asarray(s1.buttons[0])
    assert 0.35 - 1e-6 <= b[0] <= 0.65 + 1e-6
    assert -0.3 - 1e-6 <= b[1] <= 0.3 + 1e-6
    assert abs(b[2] - (Z_TABLE + BUTTON_DISTANCE_HEIGHT)) < 1e-6


@pytest.mark.fast
def test_push_down_reaches_button_and_terminates():
    """Driving the effector down over the button must accumulate 5 contacts
    and terminate with +1 rewards (kuka_button_gym_env.py:433-446)."""
    env = KukaButtonEnv(srl_model="ground_truth", noise_std=0.0)
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    # Action 4 = -dz (descend).
    total_pos_reward = 0.0
    done = False
    for i in range(1000):
        state, r, d = step(state, jnp.int32(4))
        total_pos_reward += max(float(r), 0.0)
        if bool(d):
            done = True
            break
    assert done, "episode never terminated while descending onto the button"
    assert total_pos_reward >= 5.0
    assert int(state.n_contacts[0]) >= 5


@pytest.mark.fast
def test_truncation_at_max_steps():
    env = KukaButtonEnv(srl_model="ground_truth", noise_std=0.0)
    state = env.reset(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    # Alternate left/right so the arm never descends.
    n = 0
    for i in range(1100):
        state, r, d = step(state, jnp.int32(i % 2))
        n += 1
        if bool(d):
            break
    assert n == env.max_steps + 1


@pytest.mark.fast
def test_moving_button_oscillates():
    env = KukaMovingButtonEnv(srl_model="ground_truth")
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    ys = []
    for _ in range(50):
        state, _, _ = step(state, jnp.int32(0))
        ys.append(float(state.buttons[0, 1]))
    diffs = np.diff(ys)
    assert np.allclose(np.abs(diffs), 0.001, atol=1e-6)
    assert max(ys) <= BUTTON_YMAX + 0.002


@pytest.mark.fast
def test_two_button_progression():
    env = Kuka2ButtonEnv(srl_model="ground_truth")
    state = env.reset(jax.random.PRNGKey(0))
    # Teleport tip over button 0 by forcing contacts: place button at tip xy.
    tip = kin.fk(state.q)[4]
    buttons = state.buttons.at[0, :2].set(tip[:2]).at[0, 2].set(float(tip[2]) + 0.001)
    state = state.replace(buttons=buttons)
    step = jax.jit(env.step)
    for _ in range(8):
        state, r, d = step(state, jnp.int32(0))
        # No sparse reward while pressing the FIRST button
        # (kuka_2button_gym_env.py:159-161).
        assert float(r) <= 0.0
        if int(state.goal_id) == 1:
            break
    assert int(state.goal_id) == 1
    assert int(state.n_contacts[0]) >= 5
    assert not bool(state.terminated)


@pytest.mark.fast
def test_rand_button_distractors_and_ball():
    env = KukaRandButtonEnv(srl_model="ground_truth")
    state = env.reset(jax.random.PRNGKey(0))
    assert state.distractors.shape == (10, 3)
    step = jax.jit(env.step)
    ball0 = np.asarray(state.ball[:2])
    for _ in range(15):
        state, _, _ = step(state, jnp.int32(0))
    ball1 = np.asarray(state.ball[:2])
    assert np.linalg.norm(ball1 - ball0) > 1e-4, "ball was never kicked"


@pytest.mark.fast
def test_vectorized_kuka_rollout():
    env = KukaButtonEnv(srl_model="ground_truth")
    vec = VecEnv(env, 16)
    vstate, obs = vec.reset(jax.random.PRNGKey(0))
    assert obs.shape == (16, 3)

    @jax.jit
    def run(vstate, key):
        def body(carry, _):
            vs, k = carry
            k, sub = jax.random.split(k)
            actions = jax.random.randint(sub, (16,), 0, 6)
            vs, tr = vec.step(vs, actions)
            return (vs, k), (tr.reward, tr.done)

        return jax.lax.scan(body, (vstate, key), None, length=64)

    (_, _), (rewards, dones) = run(vstate, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(rewards)).all()


@pytest.mark.fast
def test_shaped_rewards():
    env = KukaButtonEnv(srl_model="ground_truth", shape_reward=True, noise_std=0.0)
    state = env.reset(jax.random.PRNGKey(0))
    state, r, _ = jax.jit(env.step)(state, jnp.int32(0))
    tip = kin.fk(state.q)[4]
    expected = -np.linalg.norm(np.asarray(state.buttons[0]) - np.asarray(tip))
    np.testing.assert_allclose(float(r), expected, atol=1e-5)


@pytest.mark.slow
def test_kuka_ppo_learns_ground_truth():
    """PPO on KukaButton ground_truth: returns improve (the arm learns to
    descend onto the button for repeated +1 contacts)."""
    from srl_tpu.agents.ppo import PPO2

    env = KukaButtonEnv(srl_model="ground_truth")
    agent = PPO2(env=env, num_envs=32)
    rets = []

    def cb(l, g):
        if len(l["episode_returns"]) >= 10:
            rets.append(np.mean(l["episode_returns"][-10:]))

    agent.learn(total_timesteps=250_000, seed=0, callback=cb)
    assert rets, "no episodes finished"
    early = np.mean(rets[:3])
    late = np.mean(rets[-3:])
    assert late > early + 2, f"no learning: early={early:.2f} late={late:.2f}"


@pytest.mark.fast
def test_debug_sandbox(tmp_path):
    """Headless IK sandbox (environments/debug/kuka_env.py equivalent):
    tracks a reachable target and writes a rendered frame."""
    from srl_tpu.envs.debug import main, track
    from srl_tpu.ops import kinematics as kin

    q, tip, err = track(kin.settled_rest_q(), [0.55, 0.1, 0.3], steps=300)
    assert err < 0.02, err
    out = str(tmp_path / "frames")
    main(["--target", "0.55", "0.1", "0.3", "--out", out])
    import os
    assert any(f.endswith(".png") or f.endswith(".npy")
               for f in os.listdir(out))
