#!/bin/bash
# Run the test suite on CPU WITHOUT claiming the TPU tunnel.
# (The environment's sitecustomize registers the axon TPU plugin in every
# python process unless PALLAS_AXON_POOL_IPS is empty; a claimed tunnel
# blocks concurrent real-TPU jobs.)
cd "$(dirname "$0")"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu exec python -m pytest tests/ "$@"
