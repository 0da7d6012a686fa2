# -*- coding: utf-8 -*-
"""Test configuration: run everything on a virtual 8-device CPU mesh so the
same shard_map/pjit code paths as a real pod slice are exercised without TPU
hardware (SURVEY.md §4)."""

import os

# Force CPU even if the environment pre-sets a TPU platform (e.g. axon):
# tests must be hermetic and exercise the virtual multi-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Tests train on synthetic data; the random-VGG refusal (training/step.py
# _check_vgg_weights) is exercised by its own dedicated test.
os.environ.setdefault("GAUSSIANCITY_ALLOW_RANDOM_VGG", "1")

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms via config,
# which wins over the env var — override it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
