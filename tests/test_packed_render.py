"""Bit-parity of the packed-u32 compositors against naive per-channel
float references, and the learn() jit-cache behavior.

The packed renderers (ops/renderer.py, envs/car_racing.py) claim bit
identity with a straightforward float composite whose colors quantize at
the end — these tests pin that claim so future renderer changes that
alter output bits fail loudly instead of silently drifting."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srl_tpu.envs.mobile_robot import MobileRobotEnv


def _mobile_robot_float_reference(env, state):
    """Naive composite: float background, per-channel selects, final
    clip(img*255+0.5) quantization — the round-1 implementation."""
    from srl_tpu.ops import renderer as r

    grid_np, bg = r._mobile_robot_static(env.dim, 224, 224)
    img = jnp.asarray(bg)
    x = jnp.asarray(grid_np[..., 0])
    y = jnp.asarray(grid_np[..., 1])

    def paint(img, mask, color):
        return jnp.where(mask[..., None], jnp.asarray(color), img)

    t = state.targets[0]
    d2 = jnp.square(x - t[0]) + jnp.square(y - t[1])
    img = paint(img, d2 <= r.TARGET_RADIUS**2, r.TARGET_YELLOW)
    rp = state.robot_pos
    body = (jnp.abs(x - rp[0]) <= r.ROBOT_HALF_L) & (
        jnp.abs(y - rp[1]) <= r.ROBOT_HALF_W
    )
    img = paint(img, body, r.ROBOT_BODY)
    wheels = (jnp.abs(jnp.abs(x - rp[0]) - 0.22) <= 0.08) & (
        jnp.abs(jnp.abs(y - rp[1]) - r.ROBOT_HALF_W) <= 0.03
    )
    img = paint(img, wheels, r.ROBOT_WHEEL)
    return jnp.clip(img * 255.0 + 0.5, 0, 255).astype(jnp.uint8)


@pytest.mark.fast
def test_packed_compositor_bit_equals_float_reference():
    env = MobileRobotEnv(srl_model="raw_pixels")
    for seed in range(5):
        state = env.reset(jax.random.PRNGKey(seed))
        packed = np.asarray(env.observe(state))
        ref = np.asarray(_mobile_robot_float_reference(env, state))
        np.testing.assert_array_equal(packed, ref)


@pytest.mark.fast
def test_separable_coords_match_grid():
    """The [H,W,2] grid must stay the exact outer product of the 1-D
    coordinate vectors — the mask-outer-product optimization depends on
    it."""
    from srl_tpu.ops.renderer import _mobile_robot_coords, _mobile_robot_static

    for dim in (1, 2):
        xs, ys = _mobile_robot_coords(dim, 224, 224)
        grid, _ = _mobile_robot_static(dim, 224, 224)
        np.testing.assert_array_equal(grid[..., 0], np.broadcast_to(xs, (224, 224)))
        np.testing.assert_array_equal(
            grid[..., 1], np.broadcast_to(ys[:, None], (224, 224))
        )


@pytest.mark.fast
def test_carracing_packed_colors():
    """The car frame contains only the four pre-quantized colors."""
    from srl_tpu.envs.car_racing import CarRacingEnv

    env = CarRacingEnv(srl_model="raw_pixels")
    state = env.reset(jax.random.PRNGKey(0))
    img = np.asarray(env.observe(state))
    colors = {tuple(c) for c in np.unique(img.reshape(-1, 3), axis=0)}
    expected = {(102, 204, 102), (94, 188, 94), (102, 102, 102), (204, 0, 0)}
    assert colors <= expected, f"unexpected colors: {colors - expected}"
    assert (102, 102, 102) in colors  # track visible at spawn


@pytest.mark.fast
def test_learn_jit_cache_reused_across_calls():
    """Repeated learn() with the same horizon must reuse the cached jitted
    step (one cache entry), and a different horizon must rebuild."""
    from srl_tpu.agents.ppo import PPO2, PPOConfig

    env = MobileRobotEnv(max_steps=20)
    agent = PPO2(env=env, num_envs=4,
                 config=PPOConfig(n_steps=8, nminibatches=2, noptepochs=1))
    agent.learn(total_timesteps=8 * 4 * 2, seed=0)
    tx1, fn1 = agent._jit_cache[1]
    agent.learn(total_timesteps=8 * 4 * 2, seed=1)
    tx2, fn2 = agent._jit_cache[1]
    assert tx2 is tx1 and fn2 is fn1, "same horizon must reuse the trace"
    agent.learn(total_timesteps=8 * 4 * 4, seed=0)  # new lr horizon
    tx3, fn3 = agent._jit_cache[1]
    assert tx3 is not tx1 and fn3 is not fn1, (
        "a new lr horizon must rebuild the optimizer and retrace"
    )
