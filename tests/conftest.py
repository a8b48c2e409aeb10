"""Test configuration: force CPU with 8 virtual devices and enable x64.

The ambient environment registers a remote TPU backend (axon); tests must run
locally on CPU, with enough virtual devices to exercise multi-chip sharding
(see SURVEY.md §2.3) and with x64 available for dense float64 oracles.
This must happen before any jax backend initialization.
"""

import os

# STOCH_GPMP_TPU_TESTS=1 keeps the ambient (TPU) backend so the TPU-only
# tests (tests/test_fused_step_tpu.py) run on hardware:
#   STOCH_GPMP_TPU_TESTS=1 python -m pytest tests/test_fused_step_tpu.py
_ON_TPU = os.environ.get("STOCH_GPMP_TPU_TESTS") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
