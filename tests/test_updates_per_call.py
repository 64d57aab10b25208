"""Scanned multi-update PPO (updates_per_call > 1)."""
import numpy as np
import pytest

from srl_tpu.agents.ppo import PPO2, PPOConfig
from srl_tpu.envs.mobile_robot import MobileRobotEnv


@pytest.mark.fast
def test_updates_per_call_equivalent_count():
    env = MobileRobotEnv(max_steps=30)
    agent = PPO2(env=env, num_envs=4, config=PPOConfig(n_steps=8))
    state = agent.learn(total_timesteps=8 * 4 * 6, seed=0, updates_per_call=3)
    assert int(state.update_idx) == 6


@pytest.mark.fast
def test_updates_per_call_metrics_surface():
    env = MobileRobotEnv(max_steps=20)
    agent = PPO2(env=env, num_envs=4, config=PPOConfig(n_steps=8))
    entries = []
    agent.learn(total_timesteps=8 * 4 * 4, seed=0, updates_per_call=2,
                callback=lambda l, g: entries.append(l))
    assert len(entries) == 2
    assert np.isfinite(float(entries[-1]["metrics"]["pg_loss"]))
    assert entries[-1]["num_timesteps"] == 8 * 4 * 4
