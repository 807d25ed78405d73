from rankpo_tpu.native.lib import (
    is_available,
    native_pad_batch,
    native_scan_jsonl,
    native_topk_ip,
    ensure_built,
)

__all__ = [
    "is_available",
    "native_pad_batch",
    "native_scan_jsonl",
    "native_topk_ip",
    "ensure_built",
]
