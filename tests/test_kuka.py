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
    # Relative ground truth: gripper - button_top (getArmPos anchor).
    grip = kin.fk_points(state.q)[1]
    np.testing.assert_allclose(
        np.asarray(obs), np.asarray(grip - state.buttons[0]), atol=1e-6
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
    """Steer over button 0 (0.5, 0.125), press it — goal advances with NO
    sparse reward (kuka_2button_gym_env.py:159-161) — then the episode is
    still alive for button 1."""
    env = Kuka2ButtonEnv(srl_model="ground_truth", noise_std=0.0)
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    # Closed-loop: steer the integrated effector target over button 0, then
    # descend (actions 0/1 = -/+dx, 2/3 = -/+dy, 4 = -dz). The arm follows
    # the target with PyBullet-style servo lag, so the episode takes
    # several hundred steps.
    pressed_first = False
    for _ in range(1400):
        ee = np.asarray(state.ee_target)
        err = np.asarray(state.buttons[0, :2]) - ee[:2]
        if abs(err[0]) > 0.016:
            a = 1 if err[0] > 0 else 0
        elif abs(err[1]) > 0.016:
            a = 3 if err[1] > 0 else 2
        else:
            a = 4
        state, r, d = step(state, jnp.int32(a))
        # No sparse reward while pressing the FIRST button.
        assert float(r) <= 0.0
        if int(state.goal_id) == 1:
            pressed_first = True
            break
    assert pressed_first, (
        f"never pressed button 0: tip={np.asarray(state.tip)} "
        f"contacts={np.asarray(state.n_contacts)}"
    )
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
def test_rand_button_distractors_are_physical():
    """The reference's distractors are dynamic bodies the arm can shove
    (kuka_rand_button_gym_env.py:60-69); a tip overlapping a distractor
    must push it out of penetration, and non-contacted objects must not
    move."""
    from srl_tpu.envs.kuka import (
        DISTRACTOR_RADIUS, DISTRACTOR_TOP, TIP_RADIUS, Z_TABLE,
    )

    env = KukaRandButtonEnv(srl_model="ground_truth", noise_std=0.0)
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    # Descend the arm until the tip is in distractor-contact range (the
    # servo follows the integrated target with PyBullet-style lag, so this
    # takes a few hundred steps).
    for _ in range(600):
        state, _, _ = step(state, jnp.int32(4))  # -dz
        if float(state.tip[2]) <= DISTRACTOR_TOP:
            break
    assert float(state.tip[2]) <= DISTRACTOR_TOP + 1e-3, "tip never got low"
    # Plant a distractor right where the tip is; the next lateral move must
    # shove it out of penetration.
    distractors = np.asarray(state.distractors).copy()
    tip = np.asarray(state.tip)
    distractors[0] = [tip[0], tip[1], Z_TABLE + 0.03]
    before = distractors.copy()
    state = state.replace(distractors=jnp.asarray(distractors))
    state, _, _ = step(state, jnp.int32(0))  # -dx
    moved = np.asarray(state.distractors)
    new_tip = np.asarray(state.tip)
    d = np.linalg.norm(moved[0, :2] - new_tip[:2])
    assert np.linalg.norm(moved[0, :2] - before[0, :2]) > 1e-4, (
        "distractor did not respond to arm contact"
    )
    assert d >= TIP_RADIUS + DISTRACTOR_RADIUS - 1e-4, (
        f"distractor not pushed out of penetration: d={d:.4f}"
    )
    # Objects far from tip and ball are untouched.
    ball = np.asarray(state.ball[:2])
    for i in range(1, 10):
        if (np.linalg.norm(before[i, :2] - ball) > 0.2
                and np.linalg.norm(before[i, :2] - new_tip[:2]) > 0.2
                and before[i, 2] > Z_TABLE):
            np.testing.assert_array_equal(moved[i], before[i])


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
    grip = kin.fk_points(state.q)[1]
    expected = -np.linalg.norm(np.asarray(state.buttons[0]) - np.asarray(grip))
    np.testing.assert_allclose(float(r), expected, atol=1e-5)


@pytest.mark.fast
def test_ik_down_closed_form():
    """Closed-form down-orientation IK reaches arbitrary in-workspace targets
    exactly with the flange pointing straight down (kuka.py:144)."""
    for tgt in ([0.537, 0.0, 0.5], [0.55, 0.1, 0.2], [0.5, 0.0, 0.125],
                [0.65, -0.17, 0.0], [0.35, 0.3, 0.4]):
        q = kin.ik_down(jnp.array(tgt, jnp.float32))
        _, _, R, p_flange, _ = kin.fk(q)
        np.testing.assert_allclose(np.asarray(p_flange), tgt, atol=1e-5)
        np.testing.assert_allclose(np.asarray(R[:, 2]), [0, 0, -1], atol=1e-5)


@pytest.mark.fast
def test_spd_solve_matches_scipy():
    """spd_solve vs jax.scipy.linalg.solve on random SPD 6x6 systems."""
    import jax.scipy.linalg as jsl

    rng = np.random.RandomState(0)
    for _ in range(5):
        M = rng.randn(6, 6).astype(np.float32)
        A = M @ M.T + 0.5 * np.eye(6, dtype=np.float32)
        b = rng.randn(6).astype(np.float32)
        x = np.asarray(kin.spd_solve(jnp.asarray(A), jnp.asarray(b)))
        x_ref = np.asarray(jsl.solve(jnp.asarray(A), jnp.asarray(b), assume_a="pos"))
        np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.fast
def test_null_space_ik_limits_and_accuracy():
    """Null-space IK (Kuka2Button mode, kuka.py:34-43) tracks a target near
    the joint limits while staying inside them."""
    @jax.jit
    def run(q0, tgt):
        def body(_, q):
            return kin.control_step(q, tgt, null_space=True)
        return jax.lax.fori_loop(0, 2500, body, q0)

    # Button-area targets of the 2-button env (buttons at (0.5, +-0.125)).
    for tgt in ([0.55, 0.1, 0.2], [0.5, -0.125, 0.15], [0.6, 0.25, 0.35]):
        q = run(jnp.asarray(kin.REST_Q), jnp.array(tgt, jnp.float32))
        p_flange = np.asarray(kin.fk(q)[3])
        assert np.linalg.norm(p_flange - tgt) < 0.02, (tgt, p_flange)
        assert np.all(np.asarray(q) >= kin.NULL_LL - 1e-5)
        assert np.all(np.asarray(q) <= kin.NULL_UL + 1e-5)


@pytest.mark.fast
def test_tip_blocked_by_surfaces():
    """The finger tip must never sink below the supporting surface: cap top
    (pressed) over the button, table elsewhere — PyBullet's contact solver
    equivalent."""
    from srl_tpu.envs.kuka import BUTTON_CAP_PRESSED, BUTTON_CAP_RADIUS

    env = KukaButtonEnv(srl_model="ground_truth", noise_std=0.0)
    step = jax.jit(env.step)
    # Descend straight onto the button: tip stops at the pressed cap height.
    state = env.reset(jax.random.PRNGKey(0))
    for _ in range(600):
        state, r, d = step(state, jnp.int32(4))
        tip = np.asarray(state.tip)
        xy = np.linalg.norm(np.asarray(state.buttons[0, :2]) - tip[:2])
        if xy <= BUTTON_CAP_RADIUS:
            assert tip[2] >= BUTTON_CAP_PRESSED - 1e-5
        else:
            assert tip[2] >= Z_TABLE - 1e-5
        if bool(d):
            break


@pytest.mark.fast
def _random_policy_returns(env, B=32, length=2200, seed=1):
    vec = VecEnv(env, B)
    vstate, _ = vec.reset(jax.random.PRNGKey(0))

    @jax.jit
    def run(vstate, key):
        def body(carry, _):
            vs, k = carry
            k, sub = jax.random.split(k)
            actions = jax.random.randint(sub, (B,), 0, 6)
            vs, tr = vec.step(vs, actions)
            return (vs, k), (tr.reward, tr.done)

        return jax.lax.scan(body, (vstate, key), None, length=length)

    (_, _), (rewards, dones) = run(vstate, jax.random.PRNGKey(seed))
    rewards, dones = np.asarray(rewards), np.asarray(dones)
    acc, rets = np.zeros(B), []
    for t in range(rewards.shape[0]):
        acc += rewards[t]
        finished = np.where(dones[t])[0]
        rets.extend(acc[finished].tolist())
        acc[finished] = 0.0
    return np.array(rets)


def test_random_policy_is_not_trivial():
    """A random policy must not trivially max the task: the reference arm
    must land the finger on a 9 cm cap after a 0.37 m descent with the table
    as a -1 death hazard (kuka_button_gym_env.py:428-463). The default task
    starts nearly above the fixed button, so random still succeeds often —
    but deaths MUST occur and the mean must sit clearly below the max of 5.
    With random_target the button moves up to ~0.33 away and random play
    mostly dies on the table."""
    rets = _random_policy_returns(KukaButtonEnv(srl_model="ground_truth"))
    assert len(rets) >= 20, "random episodes should terminate (cap or table)"
    assert rets.mean() < 4.5, f"task too easy: random return {rets.mean():.2f}"
    assert (rets < 0).sum() > 0, "the table hazard never fired"

    rets_rt = _random_policy_returns(
        KukaButtonEnv(srl_model="ground_truth", random_target=True)
    )
    assert rets_rt.mean() < 1.5, (
        f"random_target too easy: random return {rets_rt.mean():.2f}"
    )
    assert (rets_rt < 0).sum() > len(rets_rt) // 3, "table deaths too rare"


@pytest.mark.slow
def test_kuka_ppo_learns_ground_truth():
    """PPO on KukaButton random_target ground_truth: returns improve — the
    arm must learn to steer toward the (randomized) button it observes in
    relative coordinates and land the finger on the 9 cm cap. A random
    policy scores ~-0.3 here (mostly table deaths); success is +5."""
    from srl_tpu.agents.ppo import PPO2

    env = KukaButtonEnv(srl_model="ground_truth", random_target=True)
    agent = PPO2(env=env, num_envs=32)
    rets = []

    def cb(l, g):
        if len(l["episode_returns"]) >= 10:
            rets.append(np.mean(l["episode_returns"][-10:]))

    agent.learn(total_timesteps=400_000, seed=0, callback=cb)
    assert rets, "no episodes finished"
    early = np.mean(rets[:3])
    late = np.mean(rets[-3:])
    assert late > early + 2, f"no learning: early={early:.2f} late={late:.2f}"
    assert late > 1.0, f"never learned to press: late={late:.2f}"


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
