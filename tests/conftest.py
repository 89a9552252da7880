"""Test configuration: run everything on CPU with 8 virtual devices.

Must set env vars before jax is imported anywhere (the driver benches on the
real TPU chip separately; tests validate numerics + sharding on a fake mesh,
mirroring the strategy in SURVEY.md §4).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# repo root on sys.path so `import diffusion_pullback_tpu` works without install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize force-registers the axon TPU PJRT plugin in
# every interpreter and it wins over the env var, so pin the platform via the
# config API too (this must happen before any backend is touched).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
