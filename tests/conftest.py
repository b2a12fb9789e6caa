"""Test harness: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware.

Note: the environment's sitecustomize registers a TPU ("axon") PJRT plugin
and pins JAX_PLATFORMS=axon; a plain env override is not enough, so we also
update the jax config after import.
"""

import os

if os.environ.get("EOGS2_TEST_TPU"):
    # run against the real chip (for tests/test_tpu_chip.py — the rest of
    # the suite self-gates or runs fine on one device):
    #   EOGS2_TEST_TPU=1 ./tpurun.sh python -m pytest tests/test_tpu_chip.py
    import jax  # noqa: E402
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
