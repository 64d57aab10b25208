"""PPO2 on-device actor-learner tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srl_tpu.agents.ppo import PPO2, PPOConfig
from srl_tpu.envs.mobile_robot import MobileRobotEnv


@pytest.mark.fast
def test_ppo_smoke_discrete():
    env = MobileRobotEnv()
    agent = PPO2(env=env, num_envs=8, config=PPOConfig(n_steps=32))
    rewards = []
    agent.learn(
        total_timesteps=32 * 8 * 3,
        seed=0,
        callback=lambda l, g: rewards.append(l["metrics"]["mean_reward_per_step"]),
    )
    assert len(rewards) == 3
    assert all(np.isfinite(float(r)) for r in rewards)


@pytest.mark.fast
def test_ppo_smoke_continuous():
    env = MobileRobotEnv(is_discrete=False)
    agent = PPO2(env=env, num_envs=8, config=PPOConfig(n_steps=32))
    state = agent.learn(total_timesteps=32 * 8 * 2, seed=0)
    assert int(state.update_idx) == 2


@pytest.mark.fast
def test_ppo_save_load_roundtrip(tmp_path):
    env = MobileRobotEnv()
    agent = PPO2(env=env, num_envs=4, config=PPOConfig(n_steps=16))
    agent.learn(total_timesteps=16 * 4, seed=1)
    path = str(tmp_path / "ppo2_model.pkl")
    agent.save(path)
    loaded = PPO2.load(path, env=MobileRobotEnv())
    obs = np.zeros((1, 2), np.float32)
    a1 = agent.getAction(obs, deterministic=True)
    a2 = loaded.getAction(obs, deterministic=True)
    np.testing.assert_array_equal(a1, a2)
    p1 = agent.getActionProba(obs)
    p2 = loaded.getActionProba(obs)
    np.testing.assert_allclose(p1, p2, atol=1e-6)


@pytest.mark.fast
def test_gae_matches_manual():
    from srl_tpu.agents.common import compute_gae

    T, N = 4, 2
    rng = np.random.RandomState(0)
    rewards = rng.randn(T, N).astype(np.float32)
    values = rng.randn(T, N).astype(np.float32)
    dones = np.zeros((T, N), bool)
    dones[2, 0] = True
    last_value = rng.randn(N).astype(np.float32)
    gamma, lam = 0.99, 0.95

    adv, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(last_value), gamma, lam,
    )

    expected = np.zeros((T, N), np.float32)
    gae = np.zeros(N, np.float32)
    vnext = last_value.copy()
    for t in reversed(range(T)):
        nd = 1.0 - dones[t].astype(np.float32)
        delta = rewards[t] + gamma * vnext * nd - values[t]
        gae = delta + gamma * lam * nd * gae
        expected[t] = gae
        vnext = values[t]
        gae = gae  # carried
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret), expected + values, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_ppo_learns_mobile_robot():
    """Return improves with training on the quickstart config
    (README.md:36: MobileRobot ground_truth PPO2)."""
    env = MobileRobotEnv()
    agent = PPO2(env=env, num_envs=32)
    returns = []

    def cb(l, g):
        ep = l["episode_returns"]
        if len(ep) >= 10:
            returns.append(np.mean(ep[-10:]))

    agent.learn(total_timesteps=200_000, seed=0, callback=cb)
    early = np.mean(returns[:3])
    late = np.mean(returns[-3:])
    assert late > early + 20, f"no learning: early={early:.1f} late={late:.1f}"


@pytest.mark.fast
def test_getaction_fallback_deterministic():
    """When no key is passed, getAction draws from a fixed per-agent key
    stream (not wall-clock), so two fresh agents with identical params make
    identical stochastic action sequences."""

    def fresh():
        env = MobileRobotEnv()
        agent = PPO2(env=env, num_envs=4, config=PPOConfig(n_steps=16))
        agent.learn(total_timesteps=16 * 4, seed=7)
        return agent

    a, b = fresh(), fresh()
    obs = np.zeros((5, 2), np.float32)
    seq_a = [a.getAction(obs, deterministic=False) for _ in range(3)]
    seq_b = [b.getAction(obs, deterministic=False) for _ in range(3)]
    for x, y in zip(seq_a, seq_b):
        np.testing.assert_array_equal(x, y)
    # The fallback key stream actually advances between calls: the
    # internal key must differ from both the seed key and its own value
    # one call earlier (actions may legitimately collide; keys cannot).
    k0 = np.asarray(a._act_key).copy()
    a.getAction(obs, deterministic=False)
    k1 = np.asarray(a._act_key).copy()
    assert not np.array_equal(k0, k1)
    # Deterministic mode must not consume from the stream.
    a.getAction(obs, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a._act_key), k1)


@pytest.mark.fast
def test_recompute_obs_bit_identical_update():
    """recompute_obs stores env states and re-renders per minibatch; since
    the renderer is deterministic this is a pure memory-schedule change —
    the updated parameters must be BIT-identical to the stored-slab path."""

    def one_update(recompute, remat=False):
        agent = PPO2(
            env=MobileRobotEnv(srl_model="raw_pixels", max_steps=8),
            num_envs=4,
            config=PPOConfig(n_steps=4, nminibatches=2, noptepochs=1),
            recompute_obs=recompute, remat_policy=remat,
        )
        state = agent.init_state(jax.random.PRNGKey(0), n_updates=2)
        new_state, metrics = jax.jit(agent.train_iteration)(state)
        return (jax.flatten_util.ravel_pytree(new_state.params)[0],
                float(metrics["pg_loss"]))

    ref_params, ref_loss = one_update(False)
    rec_params, rec_loss = one_update(True)
    np.testing.assert_array_equal(np.asarray(ref_params), np.asarray(rec_params))
    assert ref_loss == rec_loss
    # remat changes the backward-pass schedule only; tolerate float fuzz.
    rem_params, _ = one_update(True, remat=True)
    np.testing.assert_allclose(np.asarray(ref_params), np.asarray(rem_params),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.fast
def test_recompute_obs_rejects_normalized_obs():
    with pytest.raises(AssertionError, match="recompute_obs"):
        PPO2(env=MobileRobotEnv(srl_model="ground_truth"), num_envs=4,
             recompute_obs=True)
