"""Mixed env-family batches (core/mixed_env.py): the pod-config mechanism —
Kuka + OmniRobot pixel envs feeding one PPO learner (BASELINE.json
configs[4]; the reference's createEnvs, rl_baselines/utils.py:194-229, is
single-family only)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srl_tpu.core.env import VecEnv
from srl_tpu.core.mixed_env import MixedEnv, MixedVecEnv
from srl_tpu.envs.kuka import KukaButtonEnv
from srl_tpu.envs.omnirobot import OmniRobotEnv


def _mixed_pixels():
    return MixedEnv([
        KukaButtonEnv(srl_model="raw_pixels"),
        OmniRobotEnv(srl_model="raw_pixels"),
    ])


@pytest.mark.fast
def test_mixed_env_facade():
    env = _mixed_pixels()
    assert env.observation_space.shape == (224, 224, 3)
    # Union action space: Kuka Discrete(6) ∪ OmniRobot Discrete(4) = 6.
    assert env.action_space.n == 6
    # OmniRobot's table folds shared actions 4,5 back into its 4 moves.
    assert env._tables[0] is None
    np.testing.assert_array_equal(env._tables[1], [0, 1, 2, 3, 0, 1])
    assert env.split_counts(8) == [4, 4]
    # dp-aligned split: counts stay multiples of the shard size.
    assert env.split_counts(12, align=4) == [8, 4]


@pytest.mark.fast
def test_vecenv_dispatches_to_mixed():
    vec = VecEnv(_mixed_pixels(), 4)
    assert isinstance(vec, MixedVecEnv)
    assert vec.counts == [2, 2]


def test_mixed_step_concatenates_families():
    vec = VecEnv(_mixed_pixels(), 4)
    vstate, obs = vec.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 224, 224, 3) and obs.dtype == jnp.uint8
    vstate, tr = jax.jit(vec.step)(vstate, jnp.array([0, 5, 1, 5]))
    assert tr.obs.shape == (4, 224, 224, 3)
    assert tr.reward.shape == (4,)
    # Env slots 0-1 are Kuka (arm scene), 2-3 OmniRobot (top-down mat):
    # the two families' frames must differ structurally.
    a = np.asarray(tr.obs)
    assert np.abs(a[0].astype(int) - a[2].astype(int)).mean() > 5


def test_mixed_ppo_trains():
    """One PPO learner trains on a mixed Kuka+OmniRobot pixel batch."""
    from srl_tpu.agents.ppo import PPO2, PPOConfig

    agent = PPO2(
        env=_mixed_pixels(),
        num_envs=4,
        config=PPOConfig(n_steps=4, nminibatches=2, noptepochs=1),
    )
    agent.learn(total_timesteps=32, seed=0)
    obs = np.zeros((2, 224, 224, 3), np.uint8)
    act = agent.getAction(obs, deterministic=True)
    assert np.asarray(act).shape == (2,)
    assert int(np.max(act)) < 6


def test_train_cli_mixed_envs(tmp_path):
    """--mixed-envs trains one learner on the heterogeneous pod batch."""
    import os

    from srl_tpu.experiments.train import main as train_main

    log_dir = train_main([
        "--algo", "ppo2", "--env", "KukaButtonGymEnv-v0",
        "--mixed-envs", "KukaButtonGymEnv-v0", "OmnirobotEnv-v0",
        "--srl-model", "raw_pixels", "--num-timesteps", "32",
        "--log-dir", str(tmp_path), "--num-envs", "4", "--no-vis",
        "--hyperparam", "n_steps:4",
    ])
    assert os.path.exists(os.path.join(log_dir, "args.json"))


@pytest.mark.fast
def test_mixed_ground_truth_states():
    """The other shared-obs-space option: equal-dim SRL states
    (MobileRobot and OmniRobot ground truth are both 2-D relative
    positions)."""
    from srl_tpu.agents.ppo import PPO2, PPOConfig
    from srl_tpu.envs.mobile_robot import MobileRobotEnv

    env = MixedEnv([
        MobileRobotEnv(srl_model="ground_truth"),
        OmniRobotEnv(srl_model="ground_truth"),
    ])
    assert env.observation_space.shape == (2,)
    agent = PPO2(env=env, num_envs=8,
                 config=PPOConfig(n_steps=8, nminibatches=2, noptepochs=1))
    agent.learn(total_timesteps=8 * 8 * 2, seed=0)
    act = agent.getAction(np.zeros((3, 2), np.float32), deterministic=True)
    assert np.asarray(act).shape == (3,)
