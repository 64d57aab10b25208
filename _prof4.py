import time, jax, jax.numpy as jnp, numpy as np
from srl_tpu.envs.kuka import KukaButtonEnv
from srl_tpu.ops.renderer3d import render_kuka

env = KukaButtonEnv(srl_model="raw_pixels")
B = 64
keys = jax.random.split(jax.random.PRNGKey(0), B)
state = jax.vmap(env.reset)(keys)

f = jax.jit(lambda s: jax.vmap(lambda ss: render_kuka(env, ss))(s))
img = f(state); img.block_until_ready()
t0 = time.perf_counter()
for _ in range(10): img = f(state)
img.block_until_ready()
dt = (time.perf_counter()-t0)/10
print(f"render only: {B/dt:.1f} imgs/s, {dt/B*1e6:.1f} us/img")
# compare with env.step cost sans render
env2 = KukaButtonEnv(srl_model="ground_truth")
state2 = jax.vmap(env2.reset)(keys)
acts = jnp.zeros((B,), jnp.int32)
g = jax.jit(lambda s, a: jax.vmap(env2.step)(s, a))
s2, r, d = g(state2, acts); r.block_until_ready()
t0 = time.perf_counter()
for _ in range(10): s2, r, d = g(s2, acts)
r.block_until_ready()
dt2 = (time.perf_counter()-t0)/10
print(f"step only: {dt2/B*1e6:.2f} us/env-step")
