"""Test harness: force CPU with 8 virtual devices so sharding logic is
exercised without TPU hardware (SURVEY.md §4(e) — the standard JAX
fake-multi-device harness).

The environment's sitecustomize registers a TPU ('axon') PJRT platform in
every Python process and pins JAX_PLATFORMS=axon, so flipping the env var in
this file is not enough — the platform must be overridden through jax.config
after import (XLA_FLAGS, however, must be set before the CPU backend
initializes)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
