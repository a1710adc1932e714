"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device behavior (pjit shardings, psum-normalized losses, host gathers) is
exercised on CPU via --xla_force_host_platform_device_count, the TPU-native
analog of the reference's "debug with --num-gpus 1" strategy (SURVEY.md §4).

Note: the environment pre-sets JAX_PLATFORMS=axon (a remote single-TPU tunnel
whose per-op dispatch latency makes unjitted test code pathologically slow), so
we must force-override to CPU, not setdefault.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be imported by sitecustomize; the config path still switches
# the backend as long as no computation ran yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: this box has very few cores, and the big
# pipeline tests are compile-bound — cache XLA executables across test runs.
# The directory is keyed by the HOST's CPU feature set: XLA:CPU persists AOT
# executables whose cache key does not fully capture the target machine
# features, and loading an artifact compiled on a different
# microarchitecture SIGILLs/crashes the test process (observed round 5:
# "+prefer-no-scatter is not supported on the host machine ... SIGILL"
# after the repo directory moved boxes between rounds).
def _machine_tag():
    import hashlib
    import platform
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), platform.machine())
    except OSError:
        flags = platform.machine() + platform.processor()
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


_cache_dir = os.path.join(os.path.dirname(__file__),
                          f".jax_cache_{_machine_tag()}")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", "tests must not run over the axon TPU tunnel"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for mesh tests"
