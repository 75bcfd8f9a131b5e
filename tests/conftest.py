"""Test env: force an 8-device virtual CPU mesh before jax initializes.

Mirrors SURVEY.md §4's implication: distributed logic is tested on a CPU mesh
(``--xla_force_host_platform_device_count``) so no TPU pod is needed.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The host image's sitecustomize registers an experimental TPU plugin that
# overrides JAX_PLATFORMS; pin the platform explicitly after import.
jax.config.update("jax_platforms", "cpu")

