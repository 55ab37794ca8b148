from obman_train_tpu.parallel.mesh import (
    batch_sharding,
    infer_batch_size,
    local_shard,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "local_shard",
    "infer_batch_size",
]
