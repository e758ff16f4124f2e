from prego_tpu.parallel.mesh import make_mesh, shard, tp_mesh
from prego_tpu.parallel.sharding import (
    llama_cache_specs,
    llama_param_specs,
    shard_params,
)

__all__ = [
    "make_mesh",
    "shard",
    "tp_mesh",
    "llama_cache_specs",
    "llama_param_specs",
    "shard_params",
]
