#!/bin/bash
# Run the test suite on CPU WITHOUT claiming the TPU tunnel.
# (The environment's sitecustomize registers the axon TPU plugin in every
# python process unless PALLAS_AXON_POOL_IPS is empty; a claimed tunnel
# blocks concurrent real-TPU jobs.)
#
# With no file arguments the suite runs as FOUR pytest processes: one
# process accumulates >120 GB of live compiled executables/buffers over
# the full ~200-test run and gets OOM-killed (observed round 5; the
# trainer-heavy files are the worst); process isolation bounds the peak.
# Arguments are passed through to a single run.
cd "$(dirname "$0")"
export PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
if [ $# -gt 0 ]; then
  exec python -m pytest tests/ "$@"
fi
set -e
python -m pytest tests/ -q --ignore=tests/test_sharded.py \
  --ignore=tests/test_train_extras.py --ignore=tests/test_tsdf.py \
  --ignore=tests/test_tpu_chip.py
python -m pytest tests/test_sharded.py -q
python -m pytest tests/test_train_extras.py -q
python -m pytest tests/test_tsdf.py tests/test_tpu_chip.py -q
