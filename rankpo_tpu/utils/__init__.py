from rankpo_tpu.utils.seed import set_seed
from rankpo_tpu.utils.jsonl import read_jsonl, write_jsonl

__all__ = ["set_seed", "read_jsonl", "write_jsonl"]
