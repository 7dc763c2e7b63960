from metaasr_tpu.parallel.mesh import (
    make_mesh,
    meta_batch_shardings,
    replicated,
    shard_meta_batch,
)

__all__ = ["make_mesh", "meta_batch_shardings", "replicated", "shard_meta_batch"]
