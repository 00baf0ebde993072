"""Test env: run on CPU with 8 virtual devices so sharding/halo-exchange tests
work without a pod (SURVEY.md §4: multi-host tests on forced host platform)."""

import os

# The image environment pins JAX_PLATFORMS=axon (TPU tunnel); tests must run on
# a virtual 8-device CPU mesh, so override BOTH the env var and (because the
# axon plugin re-prepends itself into jax_platforms at import) the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
