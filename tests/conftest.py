"""Test configuration: force JAX onto an 8-device virtual CPU platform so
sharding/collective paths are exercised without TPU hardware.

Note: the environment pre-imports jax (axon sitecustomize), so env vars alone
are ignored — jax.config.update must run before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
# NOTE: CLI-test subprocesses intentionally inherit the default platform
# (TPU when present): the persistent compile cache makes warm TPU CLI runs
# ~6s, while the wavefront kernels on CPU take minutes per invocation.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
