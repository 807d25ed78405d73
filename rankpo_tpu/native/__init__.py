from rankpo_tpu.native.lib import (
    NATIVE_AVAILABLE,
    native_pad_batch,
    native_scan_jsonl,
    native_topk_ip,
    ensure_built,
)

__all__ = [
    "NATIVE_AVAILABLE",
    "native_pad_batch",
    "native_scan_jsonl",
    "native_topk_ip",
    "ensure_built",
]
