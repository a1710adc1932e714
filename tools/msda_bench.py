"""Microbenchmark: MSDA level sampling — XLA dense hat vs Pallas variants.

Production geometry (stage-3 bench, bs16): BM=128, N=Lq*P=33600, D=32, bf16.
Timing uses a scalar readback per measurement (block_until_ready does not
truly wait over the axon tunnel).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, "/root/repo")
from partdistillation_tpu.ops import msda_pallas  # noqa: E402


def xla_dense(v_whd, x, y, attw, h, w):
    return msda_pallas._xla_reference(v_whd, x, y, attw, h, w)


def timeit(fn, args, iters=8):
    out = fn(*args)
    s = float(jnp.asarray(out).ravel()[0])  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s += float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    bm, n, d = 128, 33600, 32
    for (h, w) in [(80, 80), (40, 40), (20, 20)]:
        v = jnp.asarray(rng.randn(bm, w, h * d).astype(np.float32), jnp.bfloat16)
        x = jnp.asarray(rng.rand(bm, n).astype(np.float32) * w - 0.5)
        y = jnp.asarray(rng.rand(bm, n).astype(np.float32) * h - 0.5)
        aw = jnp.asarray(rng.rand(bm, n).astype(np.float32))

        ref = None
        for name, fn in [
            ("xla_dense", jax.jit(functools.partial(xla_dense, h=h, w=w))),
            ("pallas_sel", jax.jit(lambda *a: msda_pallas._forward(*a, h, w, variant="sel"))),
            ("pallas_expand", jax.jit(lambda *a: msda_pallas._forward(*a, h, w, variant="expand"))),
        ]:
            try:
                out = fn(v, x, y, aw)
                if ref is None:
                    ref = np.asarray(out, np.float32)
                else:
                    err = np.abs(np.asarray(out, np.float32) - ref).max()
                    assert err < 0.35, f"{name} mismatch {err}"
                ms = timeit(fn, (v, x, y, aw))
                print(f"({h:3d},{w:3d}) {name:12s} {ms:8.2f} ms")
            except Exception as e:
                print(f"({h:3d},{w:3d}) {name:12s} FAILED: {str(e)[:160]}")
        print()


if __name__ == "__main__":
    main()
