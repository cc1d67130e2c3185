"""Test configuration: force CPU JAX with 8 virtual devices for sharding tests.

The environment pre-registers a remote 'axon' TPU backend (JAX_PLATFORMS=axon
via sitecustomize) whose per-jit remote compiles take ~1 min; tests must run on
local CPU (SURVEY.md §7: multi-chip sharding is tested on a virtual CPU mesh,
the real TPU is reserved for bench runs). Env vars alone don't win over the
sitecustomize, so we also update jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
