from rankpo_tpu.parallel.ring_attention import (
    context_parallel_attention,
    ring_attention_local,
)
from rankpo_tpu.parallel.sharding import (
    fsdp_partition_specs,
    param_partition_specs,
    zero1_partition_specs,
    make_shardings,
)

__all__ = [
    "context_parallel_attention",
    "ring_attention_local",
    "fsdp_partition_specs",
    "param_partition_specs",
    "zero1_partition_specs",
    "make_shardings",
]
