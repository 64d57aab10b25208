"""Frame stacking + recurrent (LSTM) PPO tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srl_tpu.core.env import VecEnv
from srl_tpu.core.frame_stack import FrameStack
from srl_tpu.envs.mobile_robot import MobileRobotEnv


@pytest.mark.fast
def test_frame_stack_vector_obs():
    env = FrameStack(MobileRobotEnv(), num_stack=4)
    assert env.observation_space.shape == (8,)
    state = env.reset(jax.random.PRNGKey(0))
    obs = np.asarray(env.observe(state))
    # New episode: zeros in older frames, current obs in the last slot.
    assert obs.shape == (8,)
    np.testing.assert_array_equal(obs.reshape(2, 4)[:, :3], 0.0)
    state, r, d = env.step(state, jnp.int32(1))
    obs2 = np.asarray(env.observe(state)).reshape(2, 4)
    # Previous obs shifted into slot -2.
    np.testing.assert_allclose(obs2[:, 2], obs.reshape(2, 4)[:, 3], atol=1e-6)


@pytest.mark.fast
def test_frame_stack_pixels_and_vec():
    env = FrameStack(MobileRobotEnv(srl_model="raw_pixels"), num_stack=2)
    assert env.observation_space.shape == (224, 224, 6)
    vec = VecEnv(env, 2)
    vstate, obs = vec.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 224, 224, 6)
    vstate, tr = jax.jit(vec.step)(vstate, jnp.zeros(2, jnp.int32))
    assert tr.obs.shape == (2, 224, 224, 6)


@pytest.mark.fast
def test_recurrent_ppo_smoke(tmp_path):
    from srl_tpu.agents.ppo import PPOConfig
    from srl_tpu.agents.recurrent_ppo import RecurrentPPO2

    env = MobileRobotEnv(max_steps=30)
    cfg = PPOConfig(n_steps=16, nminibatches=2, noptepochs=2)
    agent = RecurrentPPO2(env=env, num_envs=4, policy="lstm", config=cfg)
    state = agent.learn(total_timesteps=16 * 4 * 3, seed=0)
    assert int(state.update_idx) == 3

    obs = np.zeros((2, 2), np.float32)
    a1 = agent.getAction(obs, deterministic=True)
    assert a1.shape == (2,)
    p = agent.getActionProba(obs)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)

    path = str(tmp_path / "lstm.pkl")
    agent.save(path)
    loaded = RecurrentPPO2.load(path, env=MobileRobotEnv())
    np.testing.assert_allclose(loaded.getActionProba(obs), p, atol=1e-6)


@pytest.mark.fast
def test_recurrent_ppo_lnlstm_variant():
    from srl_tpu.agents.ppo import PPOConfig
    from srl_tpu.agents.recurrent_ppo import RecurrentPPO2

    env = MobileRobotEnv(max_steps=20)
    cfg = PPOConfig(n_steps=8, nminibatches=2, noptepochs=1)
    agent = RecurrentPPO2(env=env, num_envs=4, policy="lnlstm", config=cfg)
    agent.learn(total_timesteps=8 * 4, seed=0)


@pytest.mark.fast
def test_recurrent_a2c_smoke(tmp_path):
    from srl_tpu.agents.a2c import A2CConfig, RecurrentA2C

    env = MobileRobotEnv(max_steps=30)
    agent = RecurrentA2C(env=env, num_envs=4, policy="lstm",
                         config=A2CConfig(n_steps=8))
    state = agent.learn(total_timesteps=8 * 4 * 3, seed=0)
    assert int(state.update_idx) == 3

    obs = np.zeros((2, 2), np.float32)
    a1 = agent.getAction(obs, deterministic=True)
    assert a1.shape == (2,)
    p = agent.getActionProba(obs)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)

    path = str(tmp_path / "a2c_lstm.pkl")
    agent.save(path)
    loaded = RecurrentA2C.load(path, env=MobileRobotEnv())
    np.testing.assert_allclose(loaded.getActionProba(obs), p, atol=1e-6)


@pytest.mark.fast
def test_recurrent_acer_smoke(tmp_path):
    from srl_tpu.agents.acer import ACERConfig, RecurrentACER

    env = MobileRobotEnv(max_steps=30)
    # 5 updates so the off-policy replay path (replay_start=2) executes
    # through the BPTT segment re-run.
    cfg = ACERConfig(n_steps=8, buffer_segments=8, replay_start=2,
                     replay_ratio=2)
    agent = RecurrentACER(env=env, num_envs=4, policy="lstm", config=cfg)
    state = agent.learn(total_timesteps=8 * 4 * 5, seed=0)
    assert int(state.update_idx) == 5
    assert int(state.buffer.size) == 5
    assert np.all(np.isfinite(np.asarray(
        jax.tree.leaves(state.params)[0])))

    obs = np.zeros((2, 2), np.float32)
    a1 = agent.getAction(obs, deterministic=True)
    assert a1.shape == (2,)
    p = agent.getActionProba(obs)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)

    path = str(tmp_path / "acer_lstm.pkl")
    agent.save(path)
    loaded = RecurrentACER.load(path, env=MobileRobotEnv())
    np.testing.assert_allclose(loaded.getActionProba(obs), p, atol=1e-6)


@pytest.mark.fast
def test_recurrent_acer_lnlstm_variant():
    from srl_tpu.agents.acer import ACERConfig, RecurrentACER

    env = MobileRobotEnv(max_steps=20)
    agent = RecurrentACER(env=env, num_envs=4, policy="lnlstm",
                          config=ACERConfig(n_steps=8, buffer_segments=4))
    agent.learn(total_timesteps=8 * 4, seed=0)


@pytest.mark.fast
def test_train_cli_acer_lstm_policy(tmp_path):
    import os

    from srl_tpu.experiments.train import main as train_main

    log_dir = train_main([
        "--algo", "acer", "--env", "MobileRobotGymEnv-v0",
        "--srl-model", "ground_truth", "--policy", "lstm",
        "--num-timesteps", "300", "--log-dir", str(tmp_path),
        "--num-envs", "4", "--no-vis",
        "--hyperparam", "n_steps:8",
    ])
    assert os.path.exists(os.path.join(log_dir, "args.json"))


@pytest.mark.fast
def test_train_cli_a2c_lstm_policy(tmp_path):
    import os

    from srl_tpu.experiments.train import main as train_main

    log_dir = train_main([
        "--algo", "a2c", "--env", "MobileRobotGymEnv-v0",
        "--srl-model", "ground_truth", "--policy", "lstm",
        "--num-timesteps", "200", "--log-dir", str(tmp_path),
        "--num-envs", "4", "--no-vis",
    ])
    assert os.path.exists(os.path.join(log_dir, "args.json"))


@pytest.mark.fast
def test_recurrent_requires_divisible_envs():
    from srl_tpu.agents.recurrent_ppo import RecurrentPPO2
    from srl_tpu.agents.ppo import PPOConfig

    with pytest.raises(AssertionError):
        RecurrentPPO2(env=MobileRobotEnv(), num_envs=5,
                      config=PPOConfig(nminibatches=4))


@pytest.mark.fast
def test_train_cli_lstm_policy(tmp_path):
    from srl_tpu.experiments.train import main as train_main

    log_dir = train_main([
        "--algo", "ppo2", "--env", "MobileRobotGymEnv-v0",
        "--srl-model", "ground_truth", "--policy", "lstm",
        "--num-timesteps", "800", "--log-dir", str(tmp_path),
        "--num-envs", "4", "--no-vis",
        "--hyperparam", "n_steps:16", "noptepochs:2",
    ])
    import os

    assert os.path.exists(os.path.join(log_dir, "args.json"))


@pytest.mark.fast
def test_recurrent_acktr_smoke(tmp_path):
    from srl_tpu.agents.acktr import ACKTRConfig, RecurrentACKTR

    env = MobileRobotEnv(max_steps=30)
    cfg = ACKTRConfig(n_steps=8)
    agent = RecurrentACKTR(env=env, num_envs=4, policy="lstm", config=cfg)
    state = agent.learn(total_timesteps=8 * 4 * 4, seed=0)
    assert int(state.update_idx) == 4
    assert np.all(np.isfinite(np.asarray(
        jax.tree.leaves(state.params)[0])))

    obs = np.zeros((2, 2), np.float32)
    a1 = agent.getAction(obs, deterministic=True)
    assert a1.shape == (2,)
    p = agent.getActionProba(obs)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)

    path = str(tmp_path / "acktr_lstm.pkl")
    agent.save(path)
    loaded = RecurrentACKTR.load(path, env=MobileRobotEnv())
    np.testing.assert_allclose(loaded.getActionProba(obs), p, atol=1e-6)


@pytest.mark.fast
def test_recurrent_acktr_lnlstm_variant():
    from srl_tpu.agents.acktr import ACKTRConfig, RecurrentACKTR

    env = MobileRobotEnv(max_steps=20)
    agent = RecurrentACKTR(env=env, num_envs=4, policy="lnlstm",
                           config=ACKTRConfig(n_steps=8))
    agent.learn(total_timesteps=8 * 4 * 2, seed=0)


@pytest.mark.fast
def test_train_cli_acktr_lstm_policy(tmp_path):
    import os

    from srl_tpu.experiments.train import main as train_main

    log_dir = train_main([
        "--algo", "acktr", "--env", "MobileRobotGymEnv-v0",
        "--srl-model", "ground_truth", "--policy", "lstm",
        "--num-timesteps", "200", "--log-dir", str(tmp_path),
        "--num-envs", "4", "--no-vis",
        "--hyperparam", "n_steps:8",
    ])
    assert os.path.exists(os.path.join(log_dir, "args.json"))
