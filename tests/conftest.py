"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths compile and run without TPU hardware.

The environment may carry an `axon` TPU-tunnel plugin whose sitecustomize
force-updates jax_platforms at interpreter start (overriding the
JAX_PLATFORMS env var), so we override back at the jax.config level and
clear any already-initialized backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("UNICORE_TPU_MOCK_PROSTT5", "1")
# isolate tests from the repo-shipped etc/engines.cfg (and from each
# other): pin the engines.cfg location to a per-session temp file
import tempfile  # noqa: E402
os.environ["UNICORE_TPU_ENGINES_CFG"] = os.path.join(
    tempfile.mkdtemp(prefix="unicore_tpu_test_"), "engines.cfg"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: bucket-shaped SW/likelihood programs compile
# once per machine instead of once per test session
os.makedirs("/root/.cache/unicore_tpu/jaxcache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/unicore_tpu/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:  # pragma: no cover - defensive against jax internals drift
    pass

import pytest  # noqa: E402


@pytest.fixture
def example_data_dir():
    path = "/root/reference/example/data"
    if not os.path.isdir(path):
        pytest.skip("reference example data not available")
    return path
