import os

# Virtual 8-device CPU mesh for sharding tests; the axon TPU plugin ignores
# JAX_PLATFORMS, so force the platform through jax.config before first use.
# DSD_NEO_TEST_TPU=1 leaves the real accelerator in place so the
# TPU-gated parity tests (e.g. test_pallas_tpu_parity_when_tpu_present)
# run against actual hardware.
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if os.environ.get("DSD_NEO_TEST_TPU", "") not in ("1", "true"):
    jax.config.update("jax_platforms", "cpu")
