"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so the multi-device (data
parallel) invariants can be verified without TPU hardware — the analogue of
the reference's manual multi-GPU checks (reference readme.md:154-165).

Note: this machine's sitecustomize registers the 'axon' TPU backend and
force-sets the jax_platforms config, so the env var alone is not enough —
the config must be updated after importing jax, before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8
