from rankpo_tpu.index.flat import FlatIPIndex, numpy_search
from rankpo_tpu.index.refined import RefineIPIndex
from rankpo_tpu.index.ivf import IVFIPIndex
from rankpo_tpu.index.encoding import InferenceEncoder

__all__ = [
    "FlatIPIndex",
    "RefineIPIndex",
    "IVFIPIndex",
    "numpy_search",
    "InferenceEncoder",
]
