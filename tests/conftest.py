"""Test configuration: force JAX onto an 8-device virtual CPU platform so
sharding/collective paths are exercised without TPU hardware.

Note: the environment pre-imports jax (axon sitecustomize), so env vars alone
are ignored — jax.config.update must run before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
# Subprocesses spawned by CLI tests inherit this and run on CPU too — the
# kernels are integer-exact across backends, and CPU skips the TPU-tunnel
# compile/link latency that dominated suite wall-clock.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
