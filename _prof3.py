import time, jax, jax.numpy as jnp
from srl_tpu.envs.kuka import KukaButtonEnv
from srl_tpu.envs.mobile_robot import MobileRobotEnv
from srl_tpu.core.env import VecEnv
from bench import bench_env

steps, dt = bench_env(KukaButtonEnv(srl_model="raw_pixels"), num_envs=64, n_steps=16, n_iters=3)
print("kuka raw_pixels:", steps/dt, "steps/s")

# full PPO loop throughput on ground_truth MobileRobot
from srl_tpu.agents.ppo import PPO2, PPOConfig
env = MobileRobotEnv()
agent = PPO2(env=env, num_envs=512, config=PPOConfig())
state = agent.init_state(jax.random.PRNGKey(0), n_updates=50)
it = jax.jit(agent.train_iteration)
state, m = it(state); jax.block_until_ready(state.params)
t0 = time.perf_counter()
N = 20
for _ in range(N):
    state, m = it(state)
jax.block_until_ready(state.params)
dt = time.perf_counter()-t0
print("ppo full loop:", 512*agent.config.n_steps*N/dt, "env-steps/s")
