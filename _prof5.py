import time, jax, jax.numpy as jnp
from srl_tpu.envs.kuka import KukaButtonEnv
from srl_tpu.core.env import VecEnv

for B in (256,):
    env = KukaButtonEnv(srl_model="raw_pixels")
    vec = VecEnv(env, B)
    vstate, _ = vec.reset(jax.random.PRNGKey(0))
    step = jax.jit(vec.step)
    acts = jnp.zeros((B,), jnp.int32)
    vstate, tr = step(vstate, acts); tr.reward.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10): vstate, tr = step(vstate, acts)
    tr.reward.block_until_ready(); float(jnp.sum(tr.obs.astype(jnp.float32)))
    dt = (time.perf_counter()-t0)/10
    print(f"B={B}: vec.step {B/dt:.0f} env-steps/s ({dt*1e3:.2f} ms/step)")
