"""Algorithm suite smoke + behavior tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srl_tpu.agents.registry import registered_rl
from srl_tpu.envs.mobile_robot import MobileRobotEnv


@pytest.mark.fast
def test_registry_core_algos_present():
    for name in ["ppo2", "a2c", "ars", "deepq", "random_agent"]:
        assert name in registered_rl


@pytest.mark.fast
def test_a2c_smoke_and_roundtrip(tmp_path):
    from srl_tpu.agents.a2c import A2C, A2CConfig

    env = MobileRobotEnv()
    agent = A2C(env=env, num_envs=8, config=A2CConfig(n_steps=5))
    state = agent.learn(total_timesteps=5 * 8 * 4, seed=0)
    assert int(state.update_idx) == 4
    path = str(tmp_path / "a2c.pkl")
    agent.save(path)
    loaded = A2C.load(path, env=MobileRobotEnv())
    obs = np.zeros((1, 2), np.float32)
    np.testing.assert_array_equal(
        agent.getAction(obs, deterministic=True),
        loaded.getAction(obs, deterministic=True),
    )


@pytest.mark.fast
def test_ars_generation_updates_params():
    from srl_tpu.agents.ars import ARS, ARSConfig

    env = MobileRobotEnv(max_steps=20)
    agent = ARS(env=env, config=ARSConfig(num_population=4, max_episode_steps=25))
    M0 = np.asarray(agent.M).copy()
    agent.learn(total_timesteps=4 * 2 * 25 * 2, seed=0)
    assert not np.allclose(np.asarray(agent.M), M0)
    obs = np.zeros((3, 2), np.float32)
    actions = agent.getAction(obs)
    assert actions.shape == (3,)
    proba = agent.getActionProba(obs)
    np.testing.assert_allclose(proba.sum(axis=-1), 1.0, atol=1e-5)


@pytest.mark.fast
def test_dqn_smoke_and_buffer():
    from srl_tpu.agents.dqn import DQN, DQNConfig

    env = MobileRobotEnv(max_steps=30)
    agent = DQN(
        env=env, num_envs=4,
        config=DQNConfig(buffer_size=512, learning_starts=64, batch_size=16),
    )
    state = agent.learn(total_timesteps=1024, seed=0, chunk=32)
    assert int(state.global_step) >= 1024
    assert int(state.buffer.size) > 64
    obs = np.zeros((2, 2), np.float32)
    a = agent.getAction(obs)
    assert a.shape == (2,)
    p = agent.getActionProba(obs)
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, atol=1e-5)


@pytest.mark.fast
def test_replay_buffer_semantics():
    from srl_tpu.agents.buffers import ReplayBuffer

    buf = ReplayBuffer.create(8, (2,), jnp.float32, (), jnp.int32)
    obs = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    buf = buf.add_batch(
        obs, jnp.arange(6, dtype=jnp.int32), jnp.ones(6), obs + 1,
        jnp.zeros(6, bool),
    )
    assert int(buf.size) == 6 and int(buf.cursor) == 6
    # Wraparound.
    buf = buf.add_batch(
        obs[:4], jnp.arange(4, dtype=jnp.int32), jnp.zeros(4), obs[:4],
        jnp.ones(4, bool),
    )
    assert int(buf.size) == 8 and int(buf.cursor) == 2
    idx, batch, w = buf.sample_uniform(jax.random.PRNGKey(0), 16)
    assert batch[0].shape == (16, 2)
    idx, batch, w = buf.sample_prioritized(jax.random.PRNGKey(0), 16, 0.6, 0.4)
    assert (np.asarray(idx) < 8).all()
    buf2 = buf.update_priorities(idx, jnp.ones(16) * 2.0)
    assert float(buf2.priorities[np.asarray(idx)[0]]) == pytest.approx(2.0 + 1e-6)


@pytest.mark.fast
def test_random_agent_fps():
    from srl_tpu.agents.random_agent import RandomAgent

    env = MobileRobotEnv(max_steps=20)
    agent = RandomAgent(env=env, num_envs=8)
    agent.learn(total_timesteps=2048, seed=0)
    obs = np.zeros((4, 2), np.float32)
    assert agent.getAction(obs).shape == (4,)


@pytest.mark.slow
def test_dqn_learns():
    from srl_tpu.agents.dqn import DQN, DQNConfig

    env = MobileRobotEnv()
    agent = DQN(
        env=env, num_envs=8,
        config=DQNConfig(buffer_size=50_000, learning_starts=1000,
                         batch_size=64, exploration_fraction=0.2),
    )
    rets = []

    def cb(l, g):
        if len(l["episode_returns"]) >= 10:
            rets.append(np.mean(l["episode_returns"][-10:]))

    agent.learn(total_timesteps=120_000, seed=0, callback=cb, chunk=128)
    assert np.mean(rets[-3:]) > np.mean(rets[:3]) + 10
