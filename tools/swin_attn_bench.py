"""Microbench: Swin window attention — fused (all-heads kernel) vs XLA.

Transposed-domain API (models/swin.py TransposedDense): qt/kt/vt are
(windows, heads, head_dim, N) feature-major; the fused kernel folds the
1/sqrt(d) scale.
"""
import sys, time
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
sys.path.insert(0, "/root/repo")
from partdistillation_tpu.ops.fused_attention import (
    attention_reference_t, fused_window_attention)

def timeit(fn, args, iters=10):
    out = fn(*args); s = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    s += float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3

rng = np.random.RandomState(0)
# (windows, heads) per Swin-L stage at 640^2, ws=12, N=144, D=32
for bnw, heads, nw in [(3136, 6, 196), (784, 12, 49), (256, 24, 16), (64, 48, 4)]:
    n, d = 144, 32
    qt = jnp.asarray(rng.randn(bnw, heads, d, n).astype(np.float32), jnp.bfloat16)
    kt = jnp.asarray(rng.randn(bnw, heads, d, n).astype(np.float32), jnp.bfloat16)
    vt = jnp.asarray(rng.randn(bnw, heads, d, n).astype(np.float32), jnp.bfloat16)
    bias = jnp.asarray(rng.randn(nw, heads, n, n).astype(np.float32))
    scale = d ** -0.5
    # grouped (window-major) bias semantics: bi // (B/P)
    full = lambda q_, k_, v_, b_: attention_reference_t(
        q_, k_, v_, jnp.repeat(b_, bnw // nw, axis=0), scale)
    ref = jax.jit(full)
    fus = jax.jit(lambda q_, k_, v_, b_: fused_window_attention(
        q_, k_, v_, b_, scale=scale))
    o1 = np.asarray(ref(qt, kt, vt, bias), np.float32)
    o2 = np.asarray(fus(qt, kt, vt, bias), np.float32)
    err = np.abs(o1 - o2).max()
    t_ref = timeit(ref, (qt, kt, vt, bias))
    t_fus = timeit(fus, (qt, kt, vt, bias))
    print(f"windows={bnw:5d} heads={heads:2d}: xla {t_ref:7.2f} ms, "
          f"fused {t_fus:7.2f} ms, maxerr {err:.3f}")
