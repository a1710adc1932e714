"""Microbenchmark: P-folded MSDA level sampling — XLA dense hat vs the
Pallas folded kernel (ops/msda_pallas.sample_level_folded), with a query-tile
(TQ) sweep.

Production geometry (stage-3 bench, bs16): BM=128, Lq=8400, P=4, D=32, bf16.
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
    bm, lq, p, d = 128, 8400, 4, 32
    for (h, w) in [(80, 80), (40, 40), (20, 20)]:
        v = jnp.asarray(rng.randn(bm, h * w, d).astype(np.float32), jnp.bfloat16)
        x = jnp.asarray(rng.rand(bm, p, lq).astype(np.float32) * w - 0.5)
        y = jnp.asarray(rng.rand(bm, p, lq).astype(np.float32) * h - 0.5)
        aw = jnp.asarray(rng.rand(bm, p, lq).astype(np.float32))

        cases = [("xla_dense_folded",
                  jax.jit(functools.partial(
                      msda_pallas._xla_reference_folded, h=h, w=w)))]
        for tq in (128, 256, 512, 1024):
            cases.append((f"pallas_folded_tq{tq}",
                          jax.jit(functools.partial(
                              msda_pallas._forward_folded, h=h, w=w, tq=tq))))

        ref = None
        for name, fn in cases:
            try:
                out = fn(v, x, y, aw)
                if ref is None:
                    ref = np.asarray(out, np.float32)
                else:
                    err = np.abs(np.asarray(out, np.float32) - ref).max()
                    assert err < 0.35, f"{name} mismatch {err}"
                ms = timeit(fn, (v, x, y, aw))
                print(f"({h:3d},{w:3d}) {name:22s} {ms:8.2f} ms", flush=True)
            except Exception as e:
                print(f"({h:3d},{w:3d}) {name:22s} FAILED: {str(e)[:200]}",
                      flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
