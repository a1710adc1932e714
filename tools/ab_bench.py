"""A/B the stage-3 bench step across env-knob configs in ONE process.

Amortizes the tunnel's 7-11 min first-step cost across configs and times
every window with scalar-readback sync (the round-4 methodology — PERF.md:
`block_until_ready` returns early over the axon tunnel).

Usage:
    python tools/ab_bench.py baseline tx16:BENCH_BAND_TX=16 \
        lnoff:BENCH_FUSED_LN=0 mlp:BENCH_FUSED_MLP=1 bs32:BENCH_BS=32

Each arg is ``name[:VAR=VAL[,VAR=VAL...]]``; knobs reset between configs.
Prints one JSON line per config. This is the harness behind PERF.md's
round-4 A/B table (2-D banding tiles, fused LN/MLP, batch sweep).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.getcwd(), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import bench  # noqa: E402

KNOBS = ("BENCH_BAND_TX", "BENCH_BAND_RADIUS", "BENCH_BAND_TQ",
         "BENCH_FUSED_LN", "BENCH_FUSED_MLP", "BENCH_BS",
         "BENCH_QKV_LAYOUT", "BENCH_MASK_MAJOR", "BENCH_FUSED_PROJ",
         "BENCH_MASK_CAST", "BENCH_FUSED_MLP_STOCH")


def main():
    specs = sys.argv[1:] or ["baseline"]
    t0 = time.perf_counter()

    def mark(m):
        print(f"[+{time.perf_counter() - t0:7.1f}s] {m}",
              file=sys.stderr, flush=True)

    base_env = {k: os.environ.get(k) for k in KNOBS}
    for spec in specs:
        name, _, kvs = spec.partition(":")
        for k, v in base_env.items():
            os.environ.pop(k, None)
            if v is not None:
                os.environ[k] = v
        for kv in filter(None, kvs.split(",")):
            k, _, v = kv.partition("=")
            os.environ[k] = v
        bs = int(os.environ.get("BENCH_BS", "16"))
        try:
            mark(f"{name}: build bs{bs}")
            step, params, opt_state, batch = bench.build(bs)
            key = jax.random.PRNGKey(1)
            mark(f"{name}: compile+first")
            params, opt_state, loss = step(params, opt_state, batch, key)
            float(loss)
            for _ in range(2):
                params, opt_state, loss = step(params, opt_state, batch, key)
            float(loss)
            n = 15
            mark(f"{name}: measure {n}")
            t = time.perf_counter()
            for _ in range(n):
                params, opt_state, loss = step(params, opt_state, batch, key)
            float(loss)
            dt = time.perf_counter() - t
            print(json.dumps({"config": name, "bs": bs,
                              "ms_per_step": round(1e3 * dt / n, 1),
                              "img_per_s": round(bs * n / dt, 2)}),
                  flush=True)
            del step, params, opt_state, batch
        except Exception as e:  # noqa: BLE001 — keep sweeping other configs
            print(json.dumps({"config": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
