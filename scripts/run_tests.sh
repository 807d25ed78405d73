#!/usr/bin/env bash
# Run the test suite on the virtual 8-device CPU mesh (never the TPU tunnel).
set -euo pipefail
cd "$(dirname "$0")/.."
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu exec python -m pytest tests/ -q "$@"
