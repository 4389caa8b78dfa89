from cusrl_tpu.parallel.sharding import (
    distribute_agent,
    get_mesh,
    replicate,
    shard_batch,
    tensor_parallel_rules,
)

__all__ = ["distribute_agent", "get_mesh", "replicate", "shard_batch", "tensor_parallel_rules"]
