"""Golden-trajectory regression pins for the env kernels beyond MobileRobot
(which has a full numpy oracle, tests/oracle_mobile_robot.py).

Fixed seeds + a fixed random action stream must reproduce the committed
reward totals and final ground-truth states on the CPU test platform. These
fingerprints pin the dynamics: any change to reward shaping, contact
geometry, integrator order, or PRNG consumption shows up here first.
Regenerate deliberately (and say why in the commit) with:
  python -m tests.test_golden_trajectories
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _fingerprint(env, n_steps=50, n_envs=4, continuous=False):
    from srl_tpu.core.env import VecEnv

    vec = VecEnv(env, n_envs)
    vstate, _ = vec.reset(jax.random.PRNGKey(42))
    step = jax.jit(vec.step)
    k = jax.random.PRNGKey(7)
    rews = []
    for _ in range(n_steps):
        k, sub = jax.random.split(k)
        if continuous:
            a = jax.random.uniform(
                sub, (n_envs,) + env.action_space.shape, minval=-1, maxval=1
            )
        else:
            a = jax.random.randint(sub, (n_envs,), 0, env.action_space.n)
        vstate, tr = step(vstate, a)
        rews.append(np.asarray(tr.reward))
    gt = np.asarray(jax.vmap(env.ground_truth)(vstate.env_state))
    return float(np.stack(rews).sum()), gt.ravel()[:8].astype(np.float64)


GOLDEN = {
    "kuka": (0.0, [0.54975, 0.00753, 0.45146, 0.53723, 0.00187, 0.44849,
                   0.53498, -0.01957]),
    "car": (79.20632, [110.28472, 3.41325, 1.70117, 1.0546, -0.0, 110.31324,
                       1.39639, 2.40381]),
    "omni": (-8.0, [-0.1345, -0.38883, 0.45572, 0.77224, -0.50063, 0.24,
                    0.55422, -0.78452]),
}


def _env(name):
    if name == "kuka":
        from srl_tpu.envs.kuka import KukaButtonEnv

        return KukaButtonEnv(srl_model="ground_truth")
    if name == "car":
        from srl_tpu.envs.car_racing import CarRacingEnv

        return CarRacingEnv(srl_model="ground_truth")
    from srl_tpu.envs.omnirobot import OmniRobotEnv

    return OmniRobotEnv(srl_model="ground_truth")


# kuka's 64-env fingerprint rollout is the one compile-heavy case; it runs
# in the default tier, the cheap car/omni pins stay in --fast.
@pytest.mark.parametrize(
    "name",
    [pytest.param("car", marks=pytest.mark.fast),
     "kuka",
     pytest.param("omni", marks=pytest.mark.fast)],
)
def test_golden_trajectory(name):
    rew_sum, gt = _fingerprint(_env(name))
    want_rew, want_gt = GOLDEN[name]
    assert abs(rew_sum - want_rew) < 1e-3, (
        f"{name}: reward stream changed: {rew_sum} != {want_rew}"
    )
    np.testing.assert_allclose(gt, want_gt, atol=2e-5, err_msg=name)


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    for name in sorted(GOLDEN):
        rew, gt = _fingerprint(_env(name))
        print(f'"{name}": ({round(rew, 5)}, {[round(float(x), 5) for x in gt]}),')
