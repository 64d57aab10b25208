"""Worker process for the real 2-process jax.distributed test.

Launched by tests/test_distributed.py as ``python distributed_worker.py
<process_id> <port>``. Each process owns 2 virtual CPU devices; together
they form a 4-device global runtime. The worker initializes the multi-host
runtime through srl_tpu.parallel.distributed, claims its env slice, runs ONE
sharded PPO update on the global dp mesh, and prints the policy-gradient
loss so the parent can compare it against the single-process reference.
"""
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
n_updates = int(sys.argv[3]) if len(sys.argv) > 3 else 1
mode = sys.argv[4] if len(sys.argv) > 4 else "mobile"

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srl_tpu.agents.ppo import PPO2, PPOConfig  # noqa: E402
from srl_tpu.envs.mobile_robot import MobileRobotEnv  # noqa: E402
from srl_tpu.parallel import distributed as dist  # noqa: E402
from srl_tpu.parallel.mesh import shard_ppo_state  # noqa: E402


def make_agent(mode: str) -> PPO2:
    """The test configuration, shared with test_distributed's reference.

    "mobile": the ground-truth quickstart config. "mixed": the pod config —
    a mixed Kuka+OmniRobot raw-pixels batch feeding one CNN PPO learner
    (BASELINE.json configs[4]), tiny shapes so CPU BPTT stays fast."""
    if mode == "mixed":
        from srl_tpu.core.mixed_env import MixedEnv
        from srl_tpu.envs.kuka import KukaButtonEnv
        from srl_tpu.envs.omnirobot import OmniRobotEnv

        return PPO2(
            env=MixedEnv([
                KukaButtonEnv(srl_model="raw_pixels", render_scale=2),
                OmniRobotEnv(srl_model="raw_pixels"),
            ]),
            num_envs=8,
            config=PPOConfig(n_steps=2, nminibatches=2, noptepochs=1),
        )
    return PPO2(
        env=MobileRobotEnv(),
        num_envs=8,
        config=PPOConfig(n_steps=8, nminibatches=2, noptepochs=1),
    )


def main():
    ok = dist.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    assert ok, "multi-process runtime failed to initialize"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()

    mesh = dist.make_global_mesh(tp=1)
    # Create the gloo communicator while processes are in lockstep — the
    # mixed-pixel config's eager env-reset compiles desynchronize workers
    # past gloo's 30 s first-use handshake deadline otherwise.
    dist.warmup_collectives(mesh)
    assert mesh.shape == {"dp": 4, "tp": 1}
    # dp ordering is host-contiguous: first two devices belong to process 0.
    assert [d.process_index for d in mesh.devices.ravel().tolist()] == [0, 0, 1, 1]

    lo, hi = dist.local_env_slice(8)
    assert (lo, hi) == (pid * 4, pid * 4 + 4)

    agent = make_agent(mode)
    state = agent.init_state(jax.random.PRNGKey(0), n_updates=max(2, n_updates))
    state = shard_ppo_state(state, mesh)
    jit_iter = jax.jit(agent.train_iteration)
    # Multi-update learning curve (BASELINE learning-parity bar): the
    # per-update pg_loss and mean-reward trajectories must be identical
    # across the two processes and bit-equal to the single-process run of
    # the same global mesh.
    pg_curve, rew_curve = [], []
    for _ in range(n_updates):
        state, metrics = jit_iter(state)
        pg_curve.append(float(np.asarray(metrics["pg_loss"].addressable_data(0))))
        rew_curve.append(
            float(np.asarray(metrics["mean_reward_per_step"].addressable_data(0)))
        )
    new_state, metrics = state, metrics

    import jax.numpy as jnp

    # Metrics are replicated over the global mesh: every process reads its
    # local shard of the same value (and broadcast_one_to_all cross-checks
    # that process 0 saw the identical number).
    pg = pg_curve[-1]
    pg0 = float(np.asarray(multihost_utils.broadcast_one_to_all(np.float32(pg))))
    assert pg == pg0, (pg, pg0)

    @jax.jit
    def pnorm(params):
        return jax.tree.reduce(
            lambda a, x: a + jnp.sum(jnp.square(x.astype(jnp.float32))),
            params,
            jnp.float32(0.0),
        )

    params_norm = float(np.asarray(pnorm(new_state.params).addressable_data(0)))
    print(f"PGLOSS {pg:.8f} PNORM {params_norm:.8f}", flush=True)
    print("PGCURVE " + ",".join(f"{v:.8e}" for v in pg_curve), flush=True)
    print("RCURVE " + ",".join(f"{v:.8e}" for v in rew_curve), flush=True)
    # Rejoin before exiting: compile-time skew between workers (minutes for
    # the mixed-pixel CNN graphs on a shared CPU host) would otherwise blow
    # the runtime's fixed shutdown-barrier deadline.
    multihost_utils.sync_global_devices("srl_tpu_worker_done")


if __name__ == "__main__":
    main()
