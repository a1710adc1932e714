"""Full-program stage-5 donation-fault harness (the ACTUAL repro).

Usage: python tools/stage5_donation_harness.py [gather|onehot] [donate|nodonate]

Round-4 findings on the real chip (one variant per fresh process; the fault
kills the worker):

  gather + donate    -> CRASH at first execution ("TPU backend error
                        (Internal)" / "kernel fault") — reproduces the
                        round-3 negative result
  gather + nodonate  -> clean on a FRESH worker (354.9 ms/step, 22.54
                        img/s at bs8) but observed to crash when run right
                        after a faulted worker (state contamination)
  onehot + donate    -> clean, 356.4 ms/step (22.45 img/s) — the
                        scatter-free head slice dodges the fault entirely

Conclusion: the trigger is the GATHER head's scatter-add gradient into the
(256, 176001) kernel when the kernel/Adam-moment buffers are donated. The
minimal-program repro (tools/repro_donation_fault.py) does NOT crash — the
fault needs the full program's buffer pressure/scheduling; this harness is
the smallest known repro. Production default: head_slice="onehot" +
donate=True for the unsharded head (run.py cmd_train_distillation).
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
head = sys.argv[1] if len(sys.argv) > 1 else "gather"
donate = (sys.argv[2] if len(sys.argv) > 2 else "donate") == "donate"
os.environ["PD_HEAD_SLICE"] = head
from functools import partial
import jax, numpy as np, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
from partdistillation_tpu.engine.optim import OptimizerConfig, build_optimizer
from partdistillation_tpu.losses.criterion import CriterionConfig
from partdistillation_tpu.losses.matcher import MatcherConfig
from partdistillation_tpu.models.meta_arch.part_distillation import (
    PartDistillationConfig, make_loss_fn)
from partdistillation_tpu.models.meta_arch.proposal import normalize_images
from partdistillation_tpu.models.segmenter import MaskFormerSegmenter, SegmenterConfig
from partdistillation_tpu.models.swin import swin_large_config
from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
from partdistillation_tpu.models.transformer_decoder import TransformerDecoderConfig

t0 = time.perf_counter()
def mark(m): print(f"[+{time.perf_counter()-t0:7.1f}s] {m}", flush=True)
dtype = jnp.bfloat16
seg = SegmenterConfig(
    swin=swin_large_config(dtype=dtype),
    pixel_decoder=PixelDecoderConfig(dtype=dtype, msda_mode="banded", msda_band_radius=4),
    decoder=TransformerDecoderConfig(num_classes=8, num_queries=200, dec_layers=9,
                                     dtype=dtype, num_object_classes=22000, num_parts=8),
    freeze_backbone=True, freeze_pixel_decoder=True)
cfg = PartDistillationConfig(
    segmenter=seg,
    criterion=CriterionConfig(num_classes=8, num_points=12544,
                              importance_sample_ratio=0.0,
                              matcher=MatcherConfig(num_points=12544)),
    num_parts=8)
model = MaskFormerSegmenter(seg)
rng = np.random.RandomState(0)
b, t, hw = 8, 8, 640
batch = {
    "image": jnp.asarray(rng.randint(0, 255, (b, hw, hw, 3)), jnp.float32),
    "masks": jnp.asarray((rng.rand(b, t, hw, hw) < 0.2).astype(np.float32)),
    "labels": jnp.asarray(rng.randint(0, 8, (b, t)), jnp.int32),
    "valid": jnp.asarray(np.tile(np.arange(t) < 4, (b, 1))),
    "gt_object_class": jnp.asarray(rng.randint(0, 22000, (b,)), jnp.int32),
}
mark("init")
params = jax.jit(model.init)(jax.random.PRNGKey(0),
                             normalize_images(batch["image"][:1]),
                             gt_object_class=batch["gt_object_class"][:1])
tx = build_optimizer(OptimizerConfig(freeze_keys=("backbone", "pixel_decoder"),
                                     warmup_iters=0), params)
opt_state = tx.init(params)
loss_fn = make_loss_fn(cfg)

@partial(jax.jit, donate_argnums=(0, 1) if donate else ())
def train_step(params, opt_state, batch, key):
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, key)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss

key = jax.random.PRNGKey(1)
mark(f"first step ({head}, donate={donate})")
params, opt_state, loss = train_step(params, opt_state, batch, key)
print(f"step 0 loss={float(loss):.4f}", flush=True)
for i in range(1, 3):
    params, opt_state, loss = train_step(params, opt_state, batch, key)
print(f"steps ok, loss={float(loss):.4f}", flush=True)
n = 10
tm = time.perf_counter()
for _ in range(n):
    params, opt_state, loss = train_step(params, opt_state, batch, key)
float(loss)
dt = time.perf_counter() - tm
print(json.dumps({"head": head, "donate": donate,
                  "ms_per_step": round(1e3*dt/n, 1),
                  "img_per_s": round(b*n/dt, 2)}), flush=True)
