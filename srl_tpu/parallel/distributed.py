"""Multi-host (DCN) scale-out wiring.

The reference has no multi-node story at all (SURVEY §2.7: its only
parallelism is single-host multiprocessing + MPI inside two algos). Here
hosts join one JAX runtime via ``jax.distributed`` and the dp/tp mesh simply
spans every chip in the slice: shardings stay identical, XLA routes
collectives over ICI within a host's chips and DCN across hosts.

Usage on every host of a pod slice:

    from srl_tpu.parallel import distributed as dist
    dist.initialize()                       # env-var driven; no-op single-host
    mesh = dist.make_global_mesh(tp=1)      # all chips of all hosts
    lo, hi = dist.local_env_slice(global_num_envs)
    # build VecEnv state for [lo, hi) locally, then
    # jax.make_array_from_single_device_arrays / shard_batch as usual

Determinism across mesh shapes is preserved because every env's PRNG key is
derived from (seed, global env index) — see tests/test_sharding.py for the
bit-exactness checks on reshaped dp meshes.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-host runtime. Arguments default to the standard env
    vars (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID``; cloud-TPU metadata makes even those optional).
    Returns True if a multi-process runtime was initialized, False for the
    single-host no-op (so scripts run unchanged on one machine)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if coordinator_address is None and num_processes in (None, 1):
        # No multi-process runtime requested; safe to touch the backend now.
        return jax.process_count() > 1
    # NOTE: must not call jax.process_count()/jax.devices() before
    # jax.distributed.initialize — they would initialize the XLA backend
    # single-process and initialize() would then raise.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" in str(e).lower():
            return True
        raise
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def make_global_mesh(dp: Optional[int] = None, tp: int = 1) -> Mesh:
    """dp×tp mesh over EVERY device in the (possibly multi-host) runtime.

    Devices are ordered so each host's chips are contiguous along ``dp``:
    the env batch then shards host-locally and only gradient reductions
    cross DCN."""
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    return Mesh(np.array(devices).reshape(dp, tp), ("dp", "tp"))


def warmup_collectives(mesh: Mesh) -> None:
    """Establish the cross-host collective context while processes are
    still in lockstep.

    The CPU (gloo) backend creates its communicator on FIRST use with a
    hard 30 s key-value handshake timeout. If the first collective only
    happens after per-process work whose duration varies by more than that
    — e.g. eagerly compiling a pixel-env reset during ``init_state``, which
    takes minutes on a shared CPU host — the faster process times out
    waiting for the slower one and the run dies with
    ``Gloo context initialization failed: DEADLINE_EXCEEDED``. Running one
    trivial psum over the full mesh immediately after ``make_global_mesh``
    (when all processes are within milliseconds of each other) creates the
    communicator up front; later collectives reuse it and block without
    the handshake deadline."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    x = jax.device_put(
        jnp.zeros(n, jnp.float32),
        NamedSharding(mesh, P(*mesh.axis_names[:1])),
    )

    @jax.jit
    def _sum(v):
        return jnp.sum(v)

    jax.block_until_ready(_sum(x))


def local_env_slice(
    global_num_envs: int,
    process_id: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Tuple[int, int]:
    """[lo, hi) of the global env batch owned by this host. Global env
    indices (not local ones) seed the per-env PRNG keys, so trajectories are
    independent of the host count."""
    pid = jax.process_index() if process_id is None else process_id
    pc = jax.process_count() if process_count is None else process_count
    assert global_num_envs % pc == 0, (
        f"global_num_envs({global_num_envs}) must divide process_count({pc})"
    )
    per = global_num_envs // pc
    return pid * per, (pid + 1) * per
