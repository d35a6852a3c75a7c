"""Test configuration: force CPU JAX with 8 virtual devices so every test
(including multi-chip sharding tests) runs without TPU hardware — the
analog of the reference's dummy/llvmpipe backends (SURVEY.md §4)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
