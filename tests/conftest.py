"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device behavior (pjit shardings, psum-normalized losses, host gathers) is
exercised on CPU via --xla_force_host_platform_device_count, the TPU-native
analog of the reference's "debug with --num-gpus 1" strategy (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
