from rankpo_tpu.serve.batching import MicroBatcher
from rankpo_tpu.serve.multihost import MultihostFrontend
from rankpo_tpu.serve.service import RetrievalService

__all__ = ["MicroBatcher", "MultihostFrontend", "RetrievalService"]
