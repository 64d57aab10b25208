"""TRPO / PPO1 / ACER / ACKTR tests — completing the 12-algorithm set."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srl_tpu.envs.mobile_robot import MobileRobotEnv


@pytest.mark.fast
def test_full_algo_registry():
    from srl_tpu.agents.registry import registered_rl

    # The reference's full registered_rl surface (rl_baselines/registry.py:17-30).
    for name in ["a2c", "acer", "acktr", "ars", "cma-es", "ddpg", "deepq",
                 "ppo1", "ppo2", "random_agent", "sac", "trpo"]:
        assert name in registered_rl, name


@pytest.mark.fast
def test_trpo_smoke_improves_surrogate():
    from srl_tpu.agents.trpo import TRPO, TRPOConfig

    env = MobileRobotEnv(max_steps=30)
    agent = TRPO(env=env, num_envs=8, config=TRPOConfig(n_steps=32, cg_iters=5))
    metrics_log = []
    agent.learn(total_timesteps=32 * 8 * 3, seed=0,
                callback=lambda l, g: metrics_log.append(l["metrics"]))
    assert len(metrics_log) == 3
    # KL after update stays within the (relaxed) trust region.
    for m in metrics_log:
        assert float(m["kl"]) < 0.02
    # At least one line search accepted.
    assert any(float(m["line_search_accepted"]) > 0 for m in metrics_log)


@pytest.mark.fast
def test_trpo_continuous():
    from srl_tpu.agents.trpo import TRPO, TRPOConfig

    env = MobileRobotEnv(is_discrete=False, max_steps=20)
    agent = TRPO(env=env, num_envs=4, config=TRPOConfig(n_steps=16, cg_iters=3))
    agent.learn(total_timesteps=16 * 4 * 2, seed=0)
    a = agent.getAction(np.zeros((2, 2), np.float32), deterministic=True)
    assert a.shape == (2, 2)


@pytest.mark.fast
def test_ppo1_defaults():
    from srl_tpu.agents.ppo1 import PPO1

    env = MobileRobotEnv(max_steps=30)
    agent = PPO1(env=env, num_envs=4)
    assert agent.config.n_steps == 256
    assert agent.config.learning_rate == 1e-3
    state = agent.learn(total_timesteps=256 * 4, seed=0)
    assert int(state.update_idx) == 1


@pytest.mark.fast
def test_acer_smoke(tmp_path):
    from srl_tpu.agents.acer import ACER, ACERConfig

    env = MobileRobotEnv(max_steps=30)
    agent = ACER(env=env, num_envs=4,
                 config=ACERConfig(n_steps=10, buffer_segments=8,
                                   replay_ratio=2, replay_start=2))
    state = agent.learn(total_timesteps=10 * 4 * 5, seed=0)
    assert int(state.update_idx) == 5
    assert int(state.buffer.size) >= 5
    obs = np.zeros((2, 2), np.float32)
    p = agent.getActionProba(obs)
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, atol=1e-5)
    path = str(tmp_path / "acer.pkl")
    agent.save(path)
    loaded = ACER.load(path, env=MobileRobotEnv())
    np.testing.assert_allclose(loaded.getActionProba(obs), p, atol=1e-6)


def test_acktr_cnn_kfac():
    """ACKTR on raw pixels: the Nature-CNN torso with conv K-FAC (KFC
    patch-covariance factors) updates and keeps the trust-region step
    finite; save/load roundtrips the conv params."""
    from srl_tpu.agents.acktr import ACKTR, ACKTRConfig

    env = MobileRobotEnv(srl_model="raw_pixels", max_steps=20)
    agent = ACKTR(env=env, num_envs=2,
                  config=ACKTRConfig(n_steps=4, kfac_obs_samples=4))
    assert agent.is_cnn
    metrics_log = []
    state = agent.learn(total_timesteps=4 * 2 * 2, seed=0,
                        callback=lambda l, g: metrics_log.append(l["metrics"]))
    assert int(state.update_idx) == 2
    for m in metrics_log:
        assert np.isfinite(float(m["loss"]))
        assert 0 < float(m["eta"]) <= 0.25
    # Conv factors have KFC shapes: A = (k*k*cin+1)^2, G = cout^2.
    assert state.kfac_A["C1"].shape == (8 * 8 * 3 + 1,) * 2
    assert state.kfac_G["C3"].shape == (64, 64)
    obs = np.zeros((2, 224, 224, 3), np.uint8)
    p = agent.getActionProba(obs)
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, atol=1e-4)
    import tempfile, os as _os
    path = _os.path.join(tempfile.mkdtemp(), "acktr_cnn.pkl")
    agent.save(path)
    loaded = ACKTR.load(path, env=MobileRobotEnv(srl_model="raw_pixels"))
    np.testing.assert_allclose(loaded.getActionProba(obs), p, atol=1e-5)


@pytest.mark.fast
def test_acktr_smoke():
    from srl_tpu.agents.acktr import ACKTR, ACKTRConfig

    env = MobileRobotEnv(max_steps=30)
    agent = ACKTR(env=env, num_envs=8, config=ACKTRConfig(n_steps=10))
    metrics_log = []
    state = agent.learn(total_timesteps=10 * 8 * 4, seed=0,
                        callback=lambda l, g: metrics_log.append(l["metrics"]))
    assert int(state.update_idx) == 4
    # Trust region keeps the step size finite and positive.
    for m in metrics_log:
        assert 0 < float(m["eta"]) <= 0.25
    p = agent.getActionProba(np.zeros((2, 2), np.float32))
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, atol=1e-5)
