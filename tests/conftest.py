"""Test configuration: force CPU JAX with 8 virtual devices so every test
(including multi-chip sharding tests) runs without TPU hardware — the
analog of the reference's dummy/llvmpipe backends (SURVEY.md §4).

NB: the environment pins JAX_PLATFORMS=axon (the TPU tunnel); eager-mode
ops through the tunnel are orders of magnitude slower than CPU, so tests
must override it *before* jax initializes a backend.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize pre-registers the TPU tunnel; the config update
# (unlike the env var, which it overrides) reliably selects CPU as long
# as no backend has been initialized yet
jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
