"""raw_pixels RL paths: CNN policy through each env family's renderer."""
import pytest

from srl_tpu.agents.ppo import PPO2, PPOConfig


def _smoke(env):
    agent = PPO2(env=env, num_envs=2,
                 config=PPOConfig(n_steps=4, nminibatches=2, noptepochs=1))
    state = agent.learn(total_timesteps=4 * 2 * 2, seed=0)
    assert int(state.update_idx) == 2
    assert agent.policy.torso == "cnn"


def test_mobile_robot_pixels_ppo():
    from srl_tpu.envs.mobile_robot import MobileRobotEnv

    _smoke(MobileRobotEnv(srl_model="raw_pixels", max_steps=10))


def test_kuka_pixels_ppo():
    from srl_tpu.envs.kuka import KukaButtonEnv

    _smoke(KukaButtonEnv(max_steps=10))  # raw_pixels is the Kuka default


@pytest.mark.fast
def test_omnirobot_pixels_ppo():
    from srl_tpu.envs.omnirobot import OmniRobotEnv

    _smoke(OmniRobotEnv(max_steps=10))


@pytest.mark.slow
def test_carracing_pixels_ppo():
    from srl_tpu.envs.car_racing import CarRacingEnv

    _smoke(CarRacingEnv(max_steps=20))
