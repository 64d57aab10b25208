"""Real multi-process jax.distributed tests for srl_tpu.parallel.distributed.

Launches TWO actual processes (2 virtual CPU devices each) that join one
4-device global runtime over gloo, claim env slices, and run a sharded PPO
update — then checks the result matches a single-process 4-device run of the
same configuration bit-for-bit at the metric level. This is the DCN
(multi-host) path of SURVEY §2.7 exercised for real, not simulated.
"""
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _parse(line_output: str, tag: str) -> float:
    for line in line_output.splitlines():
        if line.startswith("PGLOSS"):
            parts = line.split()
            return float(parts[parts.index(tag) + 1])
    raise AssertionError(f"no {tag} line in output:\n{line_output}")


def _parse_curve(line_output: str, tag: str) -> np.ndarray:
    for line in line_output.splitlines():
        if line.startswith(tag + " "):
            return np.array([float(v) for v in line.split(" ", 1)[1].split(",")])
    raise AssertionError(f"no {tag} line in output:\n{line_output}")


def _launch_workers(port: int, n_updates: int = 1, mode: str = "mobile"):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "distributed_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(n_updates), mode],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\nSTDOUT:\n{out}\nSTDERR:\n{err}"
        outs.append(out)
    return outs


def _single_process_curve(n_devices: int, n_updates: int):
    """Reference curve on an n_devices dp mesh of this process."""
    from srl_tpu.agents.ppo import PPO2, PPOConfig
    from srl_tpu.envs.mobile_robot import MobileRobotEnv
    from srl_tpu.parallel.mesh import make_mesh, shard_ppo_state

    agent = PPO2(
        env=MobileRobotEnv(),
        num_envs=8,
        config=PPOConfig(n_steps=8, nminibatches=2, noptepochs=1),
    )
    state = agent.init_state(jax.random.PRNGKey(0), n_updates=max(2, n_updates))
    state = shard_ppo_state(state, make_mesh(n_devices=n_devices, tp=1))
    jit_iter = jax.jit(agent.train_iteration)
    pg, rew = [], []
    for _ in range(n_updates):
        state, metrics = jit_iter(state)
        pg.append(float(metrics["pg_loss"]))
        rew.append(float(metrics["mean_reward_per_step"]))
    return np.array(pg), np.array(rew)


@pytest.mark.slow
def test_two_process_ppo_update_matches_single_process():
    port = _free_port()
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "distributed_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\nSTDOUT:\n{out}\nSTDERR:\n{err}"
        outs.append(out)

    pg = [_parse(o, "PGLOSS") for o in outs]
    pnorm = [_parse(o, "PNORM") for o in outs]
    assert pg[0] == pg[1], f"processes disagree on pg_loss: {pg}"
    assert pnorm[0] == pnorm[1], f"processes disagree on param norm: {pnorm}"

    # Single-process reference: same 8-env PPO config on a 4-device dp mesh
    # of THIS process's virtual platform.
    from srl_tpu.agents.ppo import PPO2, PPOConfig
    from srl_tpu.envs.mobile_robot import MobileRobotEnv
    from srl_tpu.parallel.mesh import make_mesh, shard_ppo_state

    agent = PPO2(
        env=MobileRobotEnv(),
        num_envs=8,
        config=PPOConfig(n_steps=8, nminibatches=2, noptepochs=1),
    )
    state = agent.init_state(jax.random.PRNGKey(0), n_updates=2)
    state = shard_ppo_state(state, make_mesh(n_devices=4, tp=1))
    new_state, metrics = jax.jit(agent.train_iteration)(state)
    ref_pg = float(metrics["pg_loss"])
    ref_norm = float(
        jax.jit(
            lambda p: jax.tree.reduce(
                lambda a, x: a + (x.astype(jax.numpy.float32) ** 2).sum(),
                p,
                jax.numpy.float32(0.0),
            )
        )(new_state.params)
    )
    np.testing.assert_allclose(pg[0], ref_pg, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(pnorm[0], ref_norm, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_two_process_learning_curve_matches_single_process():
    """Learning-parity bar (BASELINE.md): not just one update — the full
    20-update pg-loss/reward CURVE of a two-process 4-device run must match
    the single-process 4-device run (same global mesh -> identical
    reduction order -> near-bit-equal), and a 2-device mesh of the same
    8-env config must produce the same trajectories too (the dp sharding
    must not change the math, cf. tests/test_sharding.py)."""
    n_updates = 20
    outs = _launch_workers(_free_port(), n_updates=n_updates)

    pg_w = [_parse_curve(o, "PGCURVE") for o in outs]
    rew_w = [_parse_curve(o, "RCURVE") for o in outs]
    # Both processes observed the identical replicated curves.
    np.testing.assert_array_equal(pg_w[0], pg_w[1])
    np.testing.assert_array_equal(rew_w[0], rew_w[1])

    pg_ref, rew_ref = _single_process_curve(4, n_updates)
    np.testing.assert_allclose(pg_w[0], pg_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(rew_w[0], rew_ref, rtol=1e-5, atol=1e-7)

    # Different dp layout (2 devices): same math, different partitioning.
    pg_2, rew_2 = _single_process_curve(2, n_updates)
    np.testing.assert_allclose(pg_2, pg_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(rew_2, rew_ref, rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_two_process_mixed_family_ppo_matches_single_process():
    """Pod config over DCN: a mixed Kuka+OmniRobot raw-pixels batch
    (core/mixed_env.py) trains under a two-process 4-device global mesh and
    matches the single-process run of the same mesh (BASELINE.json
    configs[4]: mixed envs over N>=2 hosts feeding one sharded learner)."""
    outs = _launch_workers(_free_port(), n_updates=1, mode="mixed")

    pg = [_parse(o, "PGLOSS") for o in outs]
    pnorm = [_parse(o, "PNORM") for o in outs]
    assert pg[0] == pg[1], f"processes disagree on pg_loss: {pg}"
    assert pnorm[0] == pnorm[1], f"processes disagree on param norm: {pnorm}"

    from srl_tpu.agents.ppo import PPO2, PPOConfig
    from srl_tpu.core.mixed_env import MixedEnv
    from srl_tpu.envs.kuka import KukaButtonEnv
    from srl_tpu.envs.omnirobot import OmniRobotEnv
    from srl_tpu.parallel.mesh import make_mesh, shard_ppo_state

    # Same configuration as distributed_worker.make_agent("mixed").
    agent = PPO2(
        env=MixedEnv([
            KukaButtonEnv(srl_model="raw_pixels", render_scale=2),
            OmniRobotEnv(srl_model="raw_pixels"),
        ]),
        num_envs=8,
        config=PPOConfig(n_steps=2, nminibatches=2, noptepochs=1),
    )
    state = agent.init_state(jax.random.PRNGKey(0), n_updates=2)
    state = shard_ppo_state(state, make_mesh(n_devices=4, tp=1))
    new_state, metrics = jax.jit(agent.train_iteration)(state)
    ref_pg = float(metrics["pg_loss"])
    np.testing.assert_allclose(pg[0], ref_pg, rtol=1e-4, atol=1e-6)
