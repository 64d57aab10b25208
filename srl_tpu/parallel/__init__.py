from srl_tpu.parallel.mesh import make_mesh, shard_batch, shard_params, shard_ppo_state
from srl_tpu.parallel import distributed

__all__ = [
    "make_mesh",
    "shard_batch",
    "shard_params",
    "shard_ppo_state",
    "distributed",
]
