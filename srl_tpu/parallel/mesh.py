"""Device mesh + sharding layout for the actor-learner.

The reference's parallelism is process-level env data-parallelism plus MPI
gradient averaging (SURVEY §2.7). Here the same two axes become mesh axes:

  * ``dp`` — the environment batch axis: VecEnv state, observations and
    rollout tensors shard their leading env dimension across ``dp``;
    gradient psum across ``dp`` is inserted by XLA from the shardings
    (replacing SubprocVecEnv workers + MPI allreduce).
  * ``tp`` — tensor parallelism for the network: Dense/Conv kernels shard
    their output-feature dimension, biases likewise (only pays off for the
    larger SRL encoders, but the layout is wired everywhere so multi-chip
    compilation is exercised end to end).

Everything rides XLA GSPMD: we annotate `NamedSharding`s on the inputs and
let the compiler insert ICI collectives.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: int = 1,
) -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if dp is None:
        dp = n_devices // tp
    assert dp * tp == n_devices, f"dp({dp}) * tp({tp}) != devices({n_devices})"
    dev_array = np.array(devices[:n_devices]).reshape(dp, tp)
    return Mesh(dev_array, ("dp", "tp"))


def shard_batch(tree, mesh: Mesh):
    """Shard the leading (env/batch) axis of every leaf over ``dp``.

    Scalar leaves and PRNG keys are replicated.
    """

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.shape["dp"] == 0 and x.shape[0] > 1:
            spec = P("dp", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def shard_params(params, mesh: Mesh):
    """Tensor-parallel layout: shard the output-feature (last) dim of every
    weight whose last dim divides the ``tp`` axis; replicate the rest."""
    tp = mesh.shape["tp"]

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and tp > 1 and x.shape[-1] % tp == 0 and x.shape[-1] >= tp:
            spec = P(*([None] * (x.ndim - 1)), "tp")
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, params)


def shard_ppo_state(state, mesh: Mesh):
    """Lay out a PPOState: env-batch leaves over dp, params/opt over tp."""
    vstate = shard_batch(state.vstate, mesh)
    obs = shard_batch(state.obs, mesh)
    params = shard_params(state.params, mesh)
    opt_state = shard_params(state.opt_state, mesh)
    repl = lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))
    return state.replace(
        vstate=vstate,
        obs=obs,
        params=params,
        opt_state=opt_state,
        obs_norm=jax.tree.map(repl, state.obs_norm),
        key=repl(state.key),
        update_idx=repl(state.update_idx),
    )
