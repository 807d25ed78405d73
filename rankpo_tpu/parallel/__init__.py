from rankpo_tpu.parallel.sharding import (
    param_partition_specs,
    zero1_partition_specs,
    make_shardings,
)

__all__ = ["param_partition_specs", "zero1_partition_specs", "make_shardings"]
