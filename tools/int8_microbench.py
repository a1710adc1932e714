"""Is int8 x int8 -> int32 actually 2x bf16 on this chip at Swin-L shapes?

Measures dot_general throughput for the frozen trunk's dominant matmul
geometries (res2-res5 MLP fc1 and window-attention qkv) in bf16 vs int8.
If XLA hits the v5e int8 MXU rate (394 TOPS vs 197 bf16 TFLOPS), int8
weight+activation quantization of the FROZEN trunk is the one structural
lever left on the stage-3/5 step (PERF.md round-4 scope profile: the step
is ~80% frozen-trunk inference). This microbench establishes the ceiling
before any quantization engineering.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_tpu"))

# (tokens, in, out) for bs16 640^2 Swin-L: res2-res5 MLP fc1; res4 qkv
SHAPES = [
    ("res2_fc1", 16 * 160 * 160, 192, 768),
    ("res3_fc1", 16 * 80 * 80, 384, 1536),
    ("res4_fc1", 16 * 40 * 40, 768, 3072),
    ("res5_fc1", 16 * 20 * 20, 1536, 6144),
    ("res4_qkv", 16 * 48 * 48, 768, 2304),
]


def bench_dot(n, k, m, dtype, iters=30):
    rng = np.random.RandomState(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.randint(-127, 127, (n, k)), jnp.int8)
        b = jnp.asarray(rng.randint(-127, 127, (k, m)), jnp.int8)
        pref = jnp.int32
    else:
        a = jnp.asarray(rng.randn(n, k), dtype)
        b = jnp.asarray(rng.randn(k, m), dtype)
        pref = jnp.float32

    @jax.jit
    def f(a, b):
        o = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=pref)
        # reduce to a scalar so readback is cheap and nothing is DCE'd
        return o.sum(dtype=pref)

    r = f(a, b)
    float(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(a, b)
    float(r)
    dt = (time.perf_counter() - t0) / iters
    return 2.0 * n * k * m / dt / 1e12  # T(FL)OPS


def main():
    for name, n, k, m in SHAPES:
        tf_bf16 = bench_dot(n, k, m, jnp.bfloat16)
        tf_int8 = bench_dot(n, k, m, jnp.int8)
        print(json.dumps({"shape": name, "nkm": [n, k, m],
                          "bf16_tflops": round(tf_bf16, 1),
                          "int8_tops": round(tf_int8, 1),
                          "speedup": round(tf_int8 / tf_bf16, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
