from rankpo_tpu.index.flat import FlatIPIndex, numpy_search
from rankpo_tpu.index.refined import RefineIPIndex
from rankpo_tpu.index.ivf import IVFIPIndex
from rankpo_tpu.index.encoding import InferenceEncoder
from rankpo_tpu.index.io import read_index, write_index

__all__ = [
    "FlatIPIndex",
    "RefineIPIndex",
    "IVFIPIndex",
    "numpy_search",
    "InferenceEncoder",
    "read_index",
    "write_index",
]
