from rankpo_tpu.index.flat import FlatIPIndex, numpy_search
from rankpo_tpu.index.refined import RefineIPIndex
from rankpo_tpu.index.ivf import IVFIPIndex
from rankpo_tpu.index.encoding import InferenceEncoder
from rankpo_tpu.index.io import read_index, write_index
from rankpo_tpu.index.factory import parse_index_spec, resolve_index_spec

__all__ = [
    "FlatIPIndex",
    "RefineIPIndex",
    "IVFIPIndex",
    "numpy_search",
    "InferenceEncoder",
    "read_index",
    "write_index",
    "parse_index_spec",
    "resolve_index_spec",
]
