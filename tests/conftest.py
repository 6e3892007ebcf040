"""Test configuration: force an 8-virtual-device CPU platform so
sharding/collective code paths run locally and deterministically.

NOTE: this environment pre-imports jax from sitecustomize (the TPU tunnel
plugin), so setting JAX_PLATFORMS via os.environ here is too late — the
config API must be used before any backend is initialized.
"""

import os

# keep env consistent for subprocesses spawned by tests
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on CPU, got " + jax.default_backend())
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
