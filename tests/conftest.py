"""Test configuration: run the JAX compute path on a virtual 8-device CPU mesh.

The container pins JAX_PLATFORMS=axon (single real TPU chip through a tunnel)
via sitecustomize, which imports jax before any user code — so env vars are
already baked.  `jax.config.update` still works, and XLA_FLAGS is read at
first backend instantiation, so setting both here (conftest imports before
any test module) reliably gives an 8-virtual-device CPU mesh for fast local
correctness + sharding tests.  Set BMT_TEST_TPU=1 to run the suite on the
real chip instead.
"""

import os

if not os.environ.get("BMT_TEST_TPU"):
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
