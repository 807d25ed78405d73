"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

This is the TPU-native substitute for "multi-node without a real cluster"
(SURVEY.md §4): collective semantics (cross-device negatives, sharded top-k
merge, ZeRO-1 optimizer sharding) are exercised on 8 faked CPU devices.
Environment variables must be set before the first `import jax` anywhere.
"""

import os

# Force CPU: the dev environment exports JAX_PLATFORMS=axon (remote TPU tunnel)
# which must never be used by unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# a sitecustomize in this image imports jax at interpreter start (before this
# file), so the env vars above may be too late — override the cached config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture(scope="session")
def mesh8():
    from rankpo_tpu.core.mesh import MeshConfig, make_mesh

    return make_mesh(MeshConfig(data_parallel=4, model_parallel=2))


@pytest.fixture(scope="session")
def data_mesh():
    from rankpo_tpu.core.mesh import MeshConfig, make_mesh

    return make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
