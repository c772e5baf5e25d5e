"""Test configuration: run JAX on a virtual 8-device CPU mesh.

IMPORTANT: on this machine a sitecustomize imports jax at interpreter
startup with JAX_PLATFORMS=axon (the remote-TPU tunnel platform), so
setting environment variables here is a no-op — jax is already imported.
Runtime config updates still work because no backend has been initialized
yet; they force genuinely-local CPU execution (the axon backend routes
every compile/execute through a remote service with multi-minute latency
variance, which must never happen in unit tests).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
