"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the 'axon' TPU backend and forces
``jax_platforms="axon,cpu"`` at interpreter start, so env vars alone don't
select CPU — we must override the config after importing jax (SURVEY.md §4:
multi-chip tests without hardware via xla_force_host_platform_device_count).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu", jax.default_backend()
