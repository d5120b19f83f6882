import os

# Virtual 8-device CPU mesh for sharding tests; the axon TPU plugin ignores
# JAX_PLATFORMS, so force the platform through jax.config before first use.
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
