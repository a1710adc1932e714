"""Profile the stage-5 train step (bench_stages.bench_stage5 workload):
per-source device-time breakdown to localize the giant-head-era slowdown."""
import collections
import glob
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench_stages  # noqa: F401  (sets compilation cache)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from partdistillation_tpu.engine.optim import OptimizerConfig, build_optimizer
    from partdistillation_tpu.losses.criterion import CriterionConfig
    from partdistillation_tpu.losses.matcher import MatcherConfig
    from partdistillation_tpu.models.meta_arch.part_distillation import (
        PartDistillationConfig, make_loss_fn)
    from partdistillation_tpu.models.meta_arch.proposal import normalize_images
    from partdistillation_tpu.models.pixel_decoder import PixelDecoderConfig
    from partdistillation_tpu.models.segmenter import (MaskFormerSegmenter,
                                                       SegmenterConfig)
    from partdistillation_tpu.models.swin import swin_large_config
    from partdistillation_tpu.models.transformer_decoder import (
        TransformerDecoderConfig)

    batch_size, image_size, num_object_classes, num_parts = 8, 640, 22000, 8
    dtype = jnp.bfloat16
    seg = SegmenterConfig(
        swin=swin_large_config(dtype=dtype),
        pixel_decoder=PixelDecoderConfig(dtype=dtype),
        decoder=TransformerDecoderConfig(
            num_classes=num_parts, num_queries=200, dec_layers=9, dtype=dtype,
            num_object_classes=num_object_classes, num_parts=num_parts),
        freeze_backbone=True, freeze_pixel_decoder=True)
    cfg = PartDistillationConfig(
        segmenter=seg,
        criterion=CriterionConfig(num_classes=num_parts, num_points=12544,
                                  matcher=MatcherConfig(num_points=12544)),
        num_parts=num_parts)
    model = MaskFormerSegmenter(seg)
    rng = np.random.RandomState(0)
    t = 8
    batch = {
        "image": jnp.asarray(rng.randint(0, 255, (batch_size, image_size, image_size, 3)), jnp.float32),
        "masks": jnp.asarray((rng.rand(batch_size, t, image_size, image_size) < 0.15).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, num_parts, (batch_size, t)), jnp.int32),
        "valid": jnp.ones((batch_size, t), bool),
        "gt_object_class": jnp.asarray(rng.randint(0, num_object_classes, (batch_size,)), jnp.int32),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 normalize_images(batch["image"][:1]),
                                 gt_object_class=batch["gt_object_class"][:1])
    tx = build_optimizer(OptimizerConfig(
        freeze_keys=("backbone", "pixel_decoder"), warmup_iters=0), params)
    opt_state = tx.init(params)
    loss_fn = make_loss_fn(cfg)

    @jax.jit
    def train_step(params, opt_state, batch, key):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    key = jax.random.PRNGKey(1)
    params, opt_state, loss = train_step(params, opt_state, batch, key)
    jax.block_until_ready(loss)

    trace_dir = "/tmp/stage5_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for i in range(3):
            params, opt_state, loss = train_step(params, opt_state, batch,
                                                 jax.random.fold_in(key, i))
        jax.block_until_ready(loss)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    agg = collections.Counter()
    op_agg = collections.Counter()
    total = 0
    for p in paths:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(p, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
            ev_names = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                # sync ops only: "XLA Modules" double-counts whole-step spans
                # and "Async XLA Ops" DMAs overlap compute (see profile_bench)
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    dur = ev.duration_ps / 1e12
                    name = ev_names.get(ev.metadata_id, "?")
                    if "copy-start" in name and "prefetch" in name:
                        continue
                    src = ""
                    for st in ev.stats:
                        if stat_names.get(st.metadata_id) == "source":
                            src = st.str_value or st.ref_value
                    agg[src or "<nosource>"] += dur
                    op_agg[name.split(".")[0]] += dur
                    total += dur
    print(f"total device time over 3 steps: {total*1e3:.1f} ms "
          f"({total/3*1e3:.1f} ms/step)")
    print("\n--- by source (top 30) ---")
    for src, tm in agg.most_common(30):
        print(f"{tm/3*1e3:9.2f} ms/step  {src[:110]}")
    print("\n--- by op kind (top 20) ---")
    for name, tm in op_agg.most_common(20):
        print(f"{tm/3*1e3:9.2f} ms/step  {name[:80]}")


if __name__ == "__main__":
    main()
