"""Test configuration: force an 8-device virtual CPU mesh.

This is the standard JAX answer to testing multi-chip sharding without a
real slice: every test sees 8 CPU 'devices' and jax.sharding code paths
compile and execute for real.

Note: the environment's sitecustomize pins ``jax_platforms='axon,cpu'``
(the tunnelled TPU); plain env vars are overridden, so the config is
updated after import — tests must run on local CPU, not through the
single-chip tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
