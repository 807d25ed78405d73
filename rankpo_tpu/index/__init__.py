from rankpo_tpu.index.flat import FlatIPIndex, numpy_search
from rankpo_tpu.index.encoding import InferenceEncoder

__all__ = ["FlatIPIndex", "numpy_search", "InferenceEncoder"]
