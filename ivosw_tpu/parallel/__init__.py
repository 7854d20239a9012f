from ivosw_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    assess_param_shardings,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "assess_param_shardings"]
