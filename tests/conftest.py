"""Test env: CPU backend with 8 forced host devices (SURVEY.md §4.5) so the
shard_map/psum/all_gather code paths run unmodified without TPUs.

NOTE: this environment pre-imports jax (sitecustomize registers a TPU PJRT
plugin and sets JAX_PLATFORMS=axon), so the env-var route is too late here —
we must flip the platform via jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
