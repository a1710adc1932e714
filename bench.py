"""Benchmark: stage-3 part-proposal training throughput (images/sec/chip).

This is the reference pipeline's canonical hot loop (SURVEY.md §3.1): a
Mask2Former Swin-L forward, Hungarian matching, point-sampled criterion, and a
clipped AdamW update, with backbone + deformable encoder frozen exactly as the
reference's stage-3 launch (sh_files/proposal_learning/train_multi.sh:8
freeze_keys='["backbone","encoder"]', batch 512 over 64 V100s = 8 img/GPU).

Baseline: the reference publishes no timing numbers (BASELINE.md). We take
3.0 images/sec per V100-32GB as the reference per-device throughput estimate
for this configuration (Mask2Former-SwinL 640^2, bs 8/GPU, frozen
backbone+encoder; consistent with the public Mask2Former model zoo's reported
~0.1 s/img full-train pace on A100s, scaled to V100 and a frozen trunk).
vs_baseline = ours / 3.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# persistent XLA executable cache: the Swin-L train step takes minutes to
# compile via the remote compile service; cache across runs
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def build(batch_size: int, image_size: int = 640, dtype=jnp.bfloat16,
          point_mode: str = "auto"):
    import optax

    from partdistillation_tpu.engine.optim import OptimizerConfig, build_optimizer
    from partdistillation_tpu.losses.criterion import CriterionConfig
    from partdistillation_tpu.losses.matcher import MatcherConfig
    from partdistillation_tpu.models.meta_arch.proposal import (
        ProposalModelConfig,
        make_loss_fn,
        normalize_images,
    )
    from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
    from partdistillation_tpu.models.segmenter import MaskFormerSegmenter, SegmenterConfig
    from partdistillation_tpu.models.swin import swin_large_config
    from partdistillation_tpu.models.transformer_decoder import TransformerDecoderConfig

    seg = SegmenterConfig(
        # BENCH_FUSED_LN=0 / BENCH_FUSED_MLP=0: A/B knobs for the Pallas
        # fused LayerNorm / fused LN+MLP half-block (both default on)
        swin=swin_large_config(
            dtype=dtype,
            fused_layernorm=os.environ.get("BENCH_FUSED_LN", "1") == "1",
            fused_mlp=os.environ.get("BENCH_FUSED_MLP", "1") == "1",
            # BENCH_FUSED_MLP_STOCH=0: round-4 behavior (kernel only for
            # identity-DropPath blocks — 23/24 trunk blocks unfused in train)
            fused_mlp_stochastic=os.environ.get("BENCH_FUSED_MLP_STOCH", "1") == "1",
            # BENCH_QKV_LAYOUT=bfn: qkv projection emits (B,3C,N) so the
            # per-q/k/v slices land in the window kernel's layout with no
            # whole-tensor relayout (VERDICT r4 #2 A/B)
            qkv_layout=os.environ.get("BENCH_QKV_LAYOUT", "bfn"),
            # BENCH_FUSED_PROJ=1: fuse the output projection into the window
            # attention kernel (attention output never round-trips HBM)
            fused_proj=os.environ.get("BENCH_FUSED_PROJ", "0") == "1"),
        # banded MSDA is exact here: the encoder is FROZEN (the stage-3
        # launch config), so offsets stay at the deformable-DETR init whose
        # max magnitude is n_points=4 level pixels < radius 6; measured
        # out-of-band attention mass 0.0 (tools/msda_offset_hist.py, PERF.md)
        pixel_decoder=PixelDecoderConfig(
            dtype=dtype, msda_mode="banded",
            # radius 4 is exact for the frozen-encoder launch config: init
            # offsets cap at exactly n_points=4 level px and cannot move;
            # measured oob mass 0.0 (PERF.md round-3 radius table). The
            # library default stays 6 (margin for unfrozen fine-tuning).
            # BENCH_BAND_RADIUS / BENCH_BAND_TQ: A/B knobs.
            msda_band_radius=int(os.environ.get("BENCH_BAND_RADIUS", "4")),
            msda_band_tile_queries=int(os.environ.get("BENCH_BAND_TQ", "512")),
            # BENCH_BAND_TX: 2-D banding tile edge (unset = 1-D row bands)
            msda_band_tile_x=(int(os.environ["BENCH_BAND_TX"])
                              if os.environ.get("BENCH_BAND_TX") else None)),
        decoder=TransformerDecoderConfig(
            num_classes=1, num_queries=200, dec_layers=9, dtype=dtype,
            # BENCH_MASK_MAJOR=0: A/B back to resizing each layer's full-res
            # mask logits instead of once-resized mask features (r5 adoption)
            attn_mask_from_features=os.environ.get("BENCH_MASK_MAJOR", "1") == "1",
            # BENCH_MASK_CAST=0: keep mask logits f32 (skip the bf16 convert
            # — its only job was feeding the reference-shaped resize chain)
            cast_mask_logits=os.environ.get("BENCH_MASK_CAST", "1") == "1"),
        # reference stage-3 freeze (train_multi.sh:8): stop-gradient releases
        # all trunk backward activations on top of the optimizer masking
        freeze_backbone=True,
        freeze_pixel_decoder=True,
    )
    cfg = ProposalModelConfig(
        segmenter=seg,
        criterion=CriterionConfig(
            num_classes=1, num_points=12544,
            # stage-3 run uses importance_sampling_ratio=0.0 (train_multi.sh:21)
            importance_sample_ratio=0.0,
            matcher=MatcherConfig(num_points=12544),
            point_mode=point_mode,
        ),
    )

    model = MaskFormerSegmenter(seg)
    rng = np.random.RandomState(0)
    t = 8  # padded pseudo-mask capacity (k=4 superpixels, dCRF can split)
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (batch_size, image_size, image_size, 3)),
                             jnp.float32),
        # f32, not bool: bool (pred) inputs get a packed T(8,128)(4,1) layout
        # whose conversion copy costs ~1.9s/step on TPU (profiled) — the
        # criterion casts to f32 anyway.
        "masks": jnp.asarray((rng.rand(batch_size, t, image_size, image_size) < 0.2)
                             .astype(np.float32)),
        "valid": jnp.asarray(np.tile(np.arange(t) < 4, (batch_size, 1))),
    }

    params = jax.jit(model.init)(jax.random.PRNGKey(0), normalize_images(batch["image"][:1]))
    ocfg = OptimizerConfig(freeze_keys=("backbone", "pixel_decoder"), warmup_iters=0)
    tx = build_optimizer(ocfg, params)
    opt_state = tx.init(params)
    loss_fn = make_loss_fn(cfg)

    # donate params/opt_state like the production Trainer: without donation
    # XLA pass-through-copies every unchanged (frozen) parameter and moment
    # to the outputs — profiled at ~1.2 s/step of async DMA at bs16
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, key):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, params, opt_state, batch


def _backend_probe(timeout_s: int = 180) -> str:
    """Probe backend liveness in a SUBPROCESS: a wedged axon tunnel makes
    PJRT client creation hang indefinitely (observed 10+ h on 2026-08-18),
    and a bench that hangs tells the driver nothing. Returns "" if live,
    else a diagnostic string."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print(d[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return f"backend init hung > {timeout_s}s (tunnel wedged?)"
    if r.returncode != 0:
        return (r.stderr or r.stdout).strip().splitlines()[-1][:300]
    return ""


def _start_watchdog(timeout_s: float):
    """A wedged tunnel RPC hangs forever inside a C extension where no
    Python exception can reach (observed: 1/5 cold runs stall >900 s in the
    first-step load; successful runs take 7-11 min). This daemon thread
    turns a hang into a fast, diagnosable failure so a driver retry can run."""
    import threading

    def bark():
        time.sleep(timeout_s)
        # stderr ONLY — a 0-value metric line on stdout could be recorded as
        # the number; no parsable output = unambiguous failed attempt
        print(f"BENCH WATCHDOG: exceeded {timeout_s:.0f}s (tunnel wedge?) — "
              "see phase marks above for where it stalled; exiting 3",
              file=sys.stderr, flush=True)
        os._exit(3)

    threading.Thread(target=bark, daemon=True).start()


def main():
    _start_watchdog(float(os.environ.get("BENCH_WATCHDOG_S", "1500")))
    err = _backend_probe()
    if err:
        print(json.dumps({
            "metric": "stage3_proposal_train_images_per_sec_per_chip",
            "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
            "error": f"TPU backend unavailable: {err}"}))
        sys.exit(1)
    # bs 16 fills the v5e better than the reference's 8/GPU (+12% measured);
    # halves on OOM below. BENCH_BS: A/B override.
    target_batch = int(os.environ.get("BENCH_BS", "16"))
    batch_size = target_batch

    t_start = time.perf_counter()

    def phase(name):
        # per-phase wall marks on stderr: a wedged run (tunnel stall, compile
        # service hang) must show WHERE it stopped, not just time out
        print(f"[bench +{time.perf_counter() - t_start:7.1f}s] {name}",
              file=sys.stderr, flush=True)

    while batch_size >= 1:
        try:
            phase(f"build bs{batch_size}")
            train_step, params, opt_state, batch = build(batch_size)
            key = jax.random.PRNGKey(1)
            phase("compile + first step")
            params, opt_state, loss = train_step(params, opt_state, batch, key)
            # scalar readback, NOT block_until_ready: over the axon tunnel
            # block_until_ready returns before the device is drained (round-1
            # finding, PERF.md timing methodology) — an under-waited warmup
            # leaks work into the timed window and deflates the number
            float(loss)
            phase("warmup")
            for _ in range(2):
                params, opt_state, loss = train_step(params, opt_state, batch, key)
            float(loss)

            n_steps = int(os.environ.get("BENCH_STEPS", "30"))
            phase(f"measure {n_steps} steps")
            t0 = time.perf_counter()
            for _ in range(n_steps):
                params, opt_state, loss = train_step(params, opt_state, batch, key)
            float(loss)
            dt = time.perf_counter() - t0
            phase("done")
            ips = batch_size * n_steps / dt
            result = {
                "metric": "stage3_proposal_train_images_per_sec_per_chip",
                "value": round(ips, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / 3.0, 3),
            }
            if batch_size != target_batch:
                # LOUD: a smaller batch is a different workload — a memory
                # regression must not masquerade as a throughput number
                result["oom_fallback_batch"] = batch_size
                print(f"WARNING: bench OOM'd at batch {target_batch}, "
                      f"measured batch {batch_size} instead — investigate the "
                      "memory regression", file=sys.stderr)
            print(json.dumps(result))
            return
        except Exception as e:  # noqa: BLE001 — OOM fallback
            if "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in str(e).lower():
                print(f"WARNING: batch {batch_size} OOM'd, retrying at "
                      f"{batch_size // 2}", file=sys.stderr)
                batch_size //= 2
                continue
            raise
    raise RuntimeError("could not fit even batch_size=1")


if __name__ == "__main__":
    main()
