from rankpo_tpu.serve.service import RetrievalService

__all__ = ["RetrievalService"]
