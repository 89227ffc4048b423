"""Test harness: force everything onto a virtual 8-device CPU mesh.

Multi-device semantics (pjit/shard_map/collectives) are validated on host CPU
devices, mirroring how the driver dry-runs the multichip path.

Note: the environment's sitecustomize may have force-registered a TPU
backend and explicitly set ``jax_platforms``; an env var alone does not win
against that, so we also call ``jax.config.update`` before any backend is
initialised.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
