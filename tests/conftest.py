"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This is the fake-backend story for distributed tests (the reference has no
test suite at all — SURVEY.md §4): sharding/collective paths are exercised on
``xla_force_host_platform_device_count=8`` CPU devices, no TPU required.

Note: the environment's sitecustomize registers a remote-TPU ("axon")
backend and imports jax at interpreter startup, so env vars alone are too
late — we must flip ``jax_platforms`` through the config API before any
backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
