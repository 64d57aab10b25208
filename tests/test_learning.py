"""Learning assertions for every registered RL algorithm.

The reference's bar is that every algorithm trains end to end
(tests/test_pipeline.py:37-63); here we additionally assert each one
actually IMPROVES over its starting returns, on the task family its action
space supports:

  * discrete on-policy (a2c/acer/acktr/trpo/ppo1) — MobileRobot ground_truth
    (dense +1-in-radius reward, returns grow into the hundreds when solved);
  * continuous off-policy (sac/ddpg) — continuous MobileRobot;
  * evolution strategies (ars/cma-es) — MobileRobot1D (linear-policy-solvable).

ppo2 and deepq have their own learning tests (test_ppo.py, test_agents.py);
random_agent has nothing to learn. Budgets are calibrated so each run takes
tens of seconds on the CPU test platform.
"""
import jax
import numpy as np
import pytest

from srl_tpu.agents.registry import registered_rl
from srl_tpu.envs.mobile_robot import MobileRobot1DEnv, MobileRobotEnv


def run_learning(algo, env, total_timesteps, num_envs=None, seed=0):
    cls = registered_rl[algo][0]
    kwargs = {"env": env}
    if num_envs is not None:
        kwargs["num_envs"] = num_envs
    agent = cls(**kwargs)
    windows = []

    def cb(l, g):
        if len(l["episode_returns"]) >= 10:
            windows.append(np.mean(l["episode_returns"][-10:]))

    agent.learn(total_timesteps=total_timesteps, seed=seed, callback=cb)
    assert windows, f"{algo}: no episodes finished"
    w = np.asarray(windows)
    k = max(3, len(w) // 5)
    return float(w[:k].mean()), float(w[-k:].mean()), w


@pytest.mark.slow
@pytest.mark.parametrize(
    "algo,total,min_gain",
    [
        ("a2c", 150_000, 50.0),
        ("acer", 150_000, 50.0),
        ("acktr", 150_000, 5.0),
        ("trpo", 150_000, 50.0),
        ("ppo1", 150_000, 30.0),
    ],
)
def test_discrete_on_policy_learns(algo, total, min_gain):
    early, late, _ = run_learning(algo, MobileRobotEnv(), total, num_envs=16)
    assert late > early + min_gain, f"{algo}: early={early:.1f} late={late:.1f}"


@pytest.mark.slow
def test_sac_learns_continuous():
    early, late, _ = run_learning(
        "sac", MobileRobotEnv(is_discrete=False), 120_000, num_envs=8
    )
    assert late > early + 30, f"sac: early={early:.1f} late={late:.1f}"


@pytest.mark.slow
def test_ddpg_learns_continuous():
    # DDPG is the noisiest learner here (as in the reference); assert the
    # best sustained window beats the start decisively.
    early, late, w = run_learning(
        "ddpg", MobileRobotEnv(is_discrete=False), 200_000, num_envs=8
    )
    best = max(
        np.asarray(w[i : i + 5]).mean() for i in range(max(1, len(w) - 4))
    )
    assert best > early + 20, f"ddpg: early={early:.1f} best5={best:.1f}"


@pytest.mark.slow
def test_cnn_learns_from_pixels():
    """The toolbox's reason to exist: RL from pixels. A Nature-CNN PPO2
    on MobileRobot raw_pixels (rendered on device, 48x48 to keep the CPU
    test budget sane; the task is identical at any resolution) must beat
    its starting window. Matches the reference's raw_pixels CnnPolicy
    pipeline (base_classes.py:227-235, README.md:5)."""
    from srl_tpu.agents.ppo import PPO2, PPOConfig

    env = MobileRobotEnv(srl_model="raw_pixels", render_shape=(48, 48))
    agent = PPO2(env=env, num_envs=16, config=PPOConfig(n_steps=128))
    assert agent.policy.torso == "cnn"
    windows = []

    def cb(l, g):
        if len(l["episode_returns"]) >= 10:
            windows.append(np.mean(l["episode_returns"][-10:]))

    agent.learn(total_timesteps=150_000, seed=0, callback=cb)
    assert windows, "no episodes finished"
    w = np.asarray(windows)
    k = max(3, len(w) // 5)
    early, late = float(w[:k].mean()), float(w[-k:].mean())
    assert late > early + 20, f"cnn-pixels: early={early:.1f} late={late:.1f}"


@pytest.mark.slow
def test_kuka_ppo2_learns():
    """Flagship-env learning pin: PPO2 on KukaButtonGymEnv-v0 ground_truth
    must reach clearly positive reward windows (random policies hover at or
    below 0: -1 for drifting out of max_distance / table contact, +1 only
    on button-cap contact, 5 contacts to terminate —
    kuka_button_gym_env.py:428-463). This pins the analytic IK/contact
    redesign's reward landscape as actually learnable, not just
    geometrically plausible."""
    from srl_tpu.agents.ppo import PPO2, PPOConfig
    from srl_tpu.envs.kuka import KukaButtonEnv

    env = KukaButtonEnv(srl_model="ground_truth")
    agent = PPO2(env=env, num_envs=32, config=PPOConfig(n_steps=128))
    windows = []

    def cb(l, g):
        if len(l["episode_returns"]) >= 10:
            windows.append(np.mean(l["episode_returns"][-10:]))

    agent.learn(total_timesteps=400_000, seed=0, callback=cb)
    assert windows, "no Kuka episodes finished"
    w = np.asarray(windows)
    k = max(3, len(w) // 5)
    early, late = float(w[:k].mean()), float(w[-k:].mean())
    assert late > max(early + 1.0, 1.0), (
        f"kuka-ppo2: early={early:.2f} late={late:.2f} — reward landscape "
        "not learnable"
    )


@pytest.mark.slow
def test_cmaes_learns_linear_task():
    early, late, _ = run_learning("cma-es", MobileRobot1DEnv(), 200_000)
    assert late > early + 20, f"cma-es: early={early:.1f} late={late:.1f}"


@pytest.mark.slow
def test_ars_learns_linear_task():
    early, late, w = run_learning("ars", MobileRobot1DEnv(), 3_000_000)
    best = max(
        np.asarray(w[i : i + 5]).mean() for i in range(max(1, len(w) - 4))
    )
    assert best > early + 5, f"ars: early={early:.1f} best5={best:.1f}"
