"""SAC / DDPG / CMA-ES smoke tests."""
import jax
import numpy as np
import pytest

from srl_tpu.envs.mobile_robot import MobileRobotEnv


@pytest.mark.fast
def test_sac_smoke(tmp_path):
    from srl_tpu.agents.sac import SAC, SACConfig

    env = MobileRobotEnv(is_discrete=False, max_steps=30)
    agent = SAC(env=env, num_envs=4,
                config=SACConfig(buffer_size=512, learning_starts=32, batch_size=16))
    state = agent.learn(total_timesteps=512, seed=0, chunk=32)
    assert int(state.global_step) >= 512
    obs = np.zeros((2, 2), np.float32)
    a = agent.getAction(obs)
    assert a.shape == (2, 2) and (np.abs(a) <= 1).all()
    path = str(tmp_path / "sac.pkl")
    agent.save(path)
    loaded = SAC.load(path, env=MobileRobotEnv(is_discrete=False))
    np.testing.assert_allclose(loaded.getAction(obs), a, atol=1e-6)


@pytest.mark.fast
def test_ddpg_smoke():
    from srl_tpu.agents.ddpg import DDPG, DDPGConfig

    env = MobileRobotEnv(is_discrete=False, max_steps=30)
    agent = DDPG(env=env, num_envs=4,
                 config=DDPGConfig(buffer_size=512, learning_starts=32,
                                   batch_size=16))
    state = agent.learn(total_timesteps=512, seed=0, chunk=32)
    assert int(state.global_step) >= 512
    a = agent.getAction(np.zeros((3, 2), np.float32))
    assert a.shape == (3, 2) and (np.abs(a) <= 1).all()


@pytest.mark.fast
def test_ddpg_param_noise_smoke():
    from srl_tpu.agents.ddpg import DDPG, DDPGConfig

    env = MobileRobotEnv(is_discrete=False, max_steps=20)
    agent = DDPG(env=env, num_envs=2,
                 config=DDPGConfig(buffer_size=128, learning_starts=16,
                                   batch_size=8, noise_param=True,
                                   noise_action="normal"))
    agent.learn(total_timesteps=128, seed=0, chunk=16)


@pytest.mark.fast
def test_cmaes_updates_and_acts():
    from srl_tpu.agents.cma_es import CMAES, CMAESConfig

    env = MobileRobotEnv(max_steps=15)
    agent = CMAES(env=env, config=CMAESConfig(num_population=6,
                                              max_episode_steps=20))
    m0 = agent.best_model.copy()
    agent.learn(total_timesteps=6 * 20 * 3, seed=0)
    # Best model found is some sampled population member (nonzero).
    assert not np.allclose(agent.best_model, m0)
    obs = np.zeros((2, 2), np.float32)
    a = agent.getAction(obs)
    assert a.shape == (2,)
    p = agent.getActionProba(obs)
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, atol=1e-5)


@pytest.mark.fast
def test_registry_has_continuous_algos():
    from srl_tpu.agents.registry import registered_rl

    for name in ["sac", "ddpg", "cma-es"]:
        assert name in registered_rl
