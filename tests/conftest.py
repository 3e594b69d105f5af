"""Test configuration: force CPU backend with 8 virtual devices so that
multi-chip sharding paths compile and run without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("UNICORE_TPU_MOCK_PROSTT5", "1")

import pytest  # noqa: E402


@pytest.fixture
def example_data_dir():
    path = "/root/reference/example/data"
    if not os.path.isdir(path):
        pytest.skip("reference example data not available")
    return path
