"""Test configuration: run on CPU with 8 virtual devices.

This is the TPU-world replacement for "testing multi-node without a
cluster" (see SURVEY.md §4): multi-device sharding tests execute on a
virtual 8-device CPU mesh via ``xla_force_host_platform_device_count``.
Must be set before jax initializes a backend, hence module-level here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# run every pallas kernel in interpret mode on the CPU backend so the
# full pallas-mode solve paths (incl. the canonical-layout schemes) are
# testable without a TPU (ops/pallas/stencil.py reads this at import)
os.environ.setdefault("SPIRK_PALLAS_INTERPRET", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# some environments register an accelerator plugin that programmatically
# overrides jax_platforms; force CPU regardless
jax.config.update("jax_platforms", "cpu")
