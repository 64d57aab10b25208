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


@pytest.mark.fast
def test_pooled_conv1_matches_upsampled_full_conv():
    """The coarse-obs policy's conv1 (2x2 block-summed kernel, stride 2 on
    the half-res image) is the exact algebra of upsample2x -> conv(8, s=4):
    same parameters, same outputs (bf16 accumulation-order tolerance)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from srl_tpu.core.spaces import Discrete
    from srl_tpu.models.policies import ActorCritic
    from srl_tpu.ops.renderer3d import upsample_nearest

    rng = np.random.RandomState(0)
    coarse = rng.randint(0, 255, (3, 112, 112, 3)).astype(np.uint8)
    full = np.asarray(upsample_nearest(jnp.asarray(coarse), 2))
    assert full.shape == (3, 224, 224, 3)

    pol_full = ActorCritic(action_space=Discrete(6), torso="cnn")
    pol_coarse = ActorCritic(action_space=Discrete(6), torso="cnn",
                             input_scale=2)
    params = pol_full.init(jax.random.PRNGKey(0), jnp.asarray(full))
    # Identical parameter pytree (names AND shapes): checkpoints interop.
    p2 = pol_coarse.init(jax.random.PRNGKey(0), jnp.asarray(coarse))
    assert jax.tree.map(lambda a, b: a.shape == b.shape, params, p2)

    dist_f, val_f = pol_full.apply(params, jnp.asarray(full))
    dist_c, val_c = pol_coarse.apply(params, jnp.asarray(coarse))
    np.testing.assert_allclose(np.asarray(dist_f.logits),
                               np.asarray(dist_c.logits),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(val_f), np.asarray(val_c),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.fast
def test_kuka_coarse_obs_env_is_the_traced_image():
    """coarse_obs exposes the traced 112x112 image whose 2x nearest
    upsample IS the render_scale=2 observation (exact uint8 equality)."""
    import jax
    import numpy as np

    from srl_tpu.envs.kuka import KukaButtonEnv

    env_c = KukaButtonEnv(srl_model="raw_pixels", render_scale=2,
                          coarse_obs=True)
    env_u = KukaButtonEnv(srl_model="raw_pixels", render_scale=2)
    assert env_c.observation_space.shape == (112, 112, 3)
    state = env_c.reset(jax.random.PRNGKey(3))
    img_c = np.asarray(env_c.render_pixels(state))
    img_u = np.asarray(env_u.render_pixels(state))
    assert img_c.shape == (112, 112, 3) and img_u.shape == (224, 224, 3)
    np.testing.assert_array_equal(img_u[::2, ::2], img_c)


def test_kuka_coarse_obs_ppo_trains():
    """PPO2 on the coarse-obs Kuka env: policy auto-folds the upsample into
    conv1 and one update runs end to end (the bench's fast pixel config)."""
    from srl_tpu.envs.kuka import KukaButtonEnv

    env = KukaButtonEnv(srl_model="raw_pixels", render_scale=2,
                        coarse_obs=True, max_steps=10)
    agent = PPO2(env=env, num_envs=2,
                 config=PPOConfig(n_steps=4, nminibatches=2, noptepochs=1),
                 recompute_obs=True)
    assert agent.policy.input_scale == 2
    state = agent.learn(total_timesteps=4 * 2 * 2, seed=0)
    assert int(state.update_idx) == 2
