"""Test configuration: force CPU with 8 virtual devices so sharding tests run
anywhere (SURVEY.md §4 — the reference has no cluster harness; we simulate a
TPU slice with xla_force_host_platform_device_count).

Note: the deployment environment exports JAX_PLATFORMS=axon (a TPU tunnel), so
the env var alone is not enough — jax.config must be updated before any backend
is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
