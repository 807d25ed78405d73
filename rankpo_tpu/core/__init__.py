from rankpo_tpu.core.mesh import MeshConfig, make_mesh, local_mesh
from rankpo_tpu.core.precision import Policy, DEFAULT_POLICY, BF16_POLICY

__all__ = [
    "MeshConfig",
    "make_mesh",
    "local_mesh",
    "Policy",
    "DEFAULT_POLICY",
    "BF16_POLICY",
]
