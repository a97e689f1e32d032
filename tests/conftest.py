"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; per SURVEY.md section 4 the whole
data-parallel story is covered by ``--xla_force_host_platform_device_count=8``
CPU simulation.

An installed pytest plugin imports jax before this conftest runs, so plain
env-var exports are too late for the import — but the XLA backend is not
initialized until first use, so ``jax.config.update`` + XLA_FLAGS still take
effect here.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices for tests, got {jax.device_count()} "
    f"on {jax.devices()[0].platform}"
)
