"""Test configuration: CPU backend with 8 virtual devices + float64.

The shipped environment pins JAX_PLATFORMS=axon (one real TPU chip via a
tunnel); tests run on the host CPU instead so they are fast, deterministic,
f64-capable (the reference engine is f64 end-to-end), and can exercise
multi-chip sharding on a virtual 8-device mesh
(SURVEY.md §4 "what the rebuild should do instead").

This must run before any JAX backend initialization, hence conftest top-level.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
