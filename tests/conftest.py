"""Test configuration: force CPU with 8 virtual devices and enable x64.

The ambient environment registers a remote TPU backend (axon); tests must run
locally on CPU, with enough virtual devices to exercise multi-chip sharding
(see SURVEY.md §2.3) and with x64 available for dense float64 oracles.
This must happen before any jax backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
