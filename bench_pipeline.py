"""Composite stages-1→5 pipeline benchmark — the BASELINE.md north-star shape.

Chains the REAL stage CLIs (label → propose → dcrf → train-proposal →
rank cluster+save → train-distillation) at production geometry (640²,
Swin-L, 200 queries, bs16 trains / bs8 inference, 22k-class stage-5 head)
over a synthetic mini-ImageNet, with real pseudo-label-store I/O between
stages — the workload the reference runs as chained SLURM job farms
(sh_files/detic/run.sh → sh_files/dcrf/run.sh →
sh_files/proposal_learning/train_multi.sh → sh_files/part_ranking/run.sh →
sh_files/part_distillation_training/train.sh).

Each stage runs in a FRESH process (the stage-5 program must be first in its
process — PERF.md round-3 operational note) via
``python -m partdistillation_tpu.run <stage> ...``, and reports
``first_batch_s`` (jit compile + executable load, amortized over hours in
production) separately from ``images_per_sec_steady`` (run._StageTimer).

Reported numbers (one JSON line, bench.py format, plus a detail object):

* ``pipeline_images_per_sec_steady`` — N_images / Σ_stages(stage steady
  time), the rate a long production run approaches per chip. Train stages
  are counted at one epoch over the mini-set (steps = N/batch).
* ``pipeline_images_per_sec_wall`` — N / total wall clock including
  compiles, process startup, store I/O (what THIS run actually took).
* per-stage share of the steady pipeline second + store sizes (MB).

Composite baseline (vs_baseline): the per-stage reference estimates used in
bench_stages.py (stage1 ≈3, stage2 ≈5, stage3 ≈3, stage4 ≈5, stage5 ≈3
img/s/V100) composed harmonically = 1/(1/3+1/5+1/3+1/5+1/3) ≈ **0.71
img/s/V100** per chained image; the reference's dCRF runs on a separate
90-process CPU farm so its time is EXCLUDED from the baseline but INCLUDED
in our number (conservative in our disfavor).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
FORCE_CPU = False
BASELINE_COMPOSITE = 1.0 / (1 / 3.0 + 1 / 5.0 + 1 / 3.0 + 1 / 5.0 + 1 / 3.0)

CODES = ["n01440764", "n01443537"]


def log(msg):
    print(f"[bench_pipeline +{time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.perf_counter()


def build_dataset(root, det_dir, n_images, size):
    """Synthetic mini-ImageNet: colored two-part object on noise, plus the
    stage-1 precomputed-detections store (the external-detector contract)."""
    sys.path.insert(0, ROOT)
    from PIL import Image

    from partdistillation_tpu.data.pseudo_store import ShardWriter
    from partdistillation_tpu.utils import rle as rle_codec

    rng = np.random.RandomState(0)
    per_class = n_images // len(CODES)
    with ShardWriter(det_dir, 0, 1) as w:
        for ci, code in enumerate(CODES):
            d = os.path.join(root, code)
            os.makedirs(d, exist_ok=True)
            for j in range(per_class):
                img = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
                # object box with two structured halves (k-means/dCRF food)
                y0, x0 = rng.randint(size // 8, size // 4, 2)
                y1, x1 = size - rng.randint(size // 8, size // 4, 2)
                ym = (y0 + y1) // 2
                img[y0:ym, x0:x1] = [220 - 40 * ci, 60, 60 + 60 * ci]
                img[ym:y1, x0:x1] = [60, 200, 220 - 80 * ci]
                Image.fromarray(img).save(
                    os.path.join(d, f"{code}_{j}.JPEG"), quality=90)
                obj = np.zeros((size, size), bool)
                obj[y0:y1, x0:x1] = True
                noise = np.zeros((size, size), bool)
                noise[: size // 8, : size // 8] = True
                w.write({
                    "image_id": f"{code}_{j}",
                    "masks": [rle_codec.encode(obj), rle_codec.encode(noise)],
                    "scores": [0.9, 0.4],
                    "class_ids": [ci, 1 - ci],
                })
    with open(os.path.join(root, "labels.txt"), "w") as f:
        f.writelines(f"{c} class{i}\n" for i, c in enumerate(CODES))


def run_stage(name, argv, timeout=3600):
    """Run one stage CLI in a fresh process; return (json_line, wall_s)."""
    log(f"stage {name}: {' '.join(argv[:6])} ...")
    t = time.perf_counter()
    env = dict(os.environ)
    if FORCE_CPU:
        # strip the axon sitecustomize (it pins the tunnel backend even
        # against JAX_PLATFORMS=cpu) — CPU smoke mode for plumbing checks
        env["PYTHONPATH"] = ROOT
        env["JAX_PLATFORMS"] = "cpu"
    else:
        env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "partdistillation_tpu.run", *argv],
        capture_output=True, text=True, timeout=timeout, cwd=ROOT, env=env)
    wall = time.perf_counter() - t
    if proc.returncode != 0:
        log(f"stage {name} FAILED rc={proc.returncode}\n"
            f"stdout tail: {proc.stdout[-2000:]}\n"
            f"stderr tail: {proc.stderr[-3000:]}")
        raise SystemExit(f"stage {name} failed")
    result = None
    for line in proc.stdout.strip().splitlines():
        try:
            result = json.loads(line)
        except ValueError:
            continue
    log(f"stage {name}: wall {wall:.1f}s, result {result}")
    return result, wall


def du_mb(path):
    total = 0
    for dirpath, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return round(total / 2**20, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--train-bs", type=int, default=16)
    ap.add_argument("--infer-bs", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/pd_pipeline_bench")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny models + 64px (plumbing smoke, not a benchmark)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend in stage subprocesses (smoke)")
    ap.add_argument("--keep", action="store_true", help="keep workdir")
    ap.add_argument("--stage5-classes", type=int, default=22000)
    args = ap.parse_args()
    global FORCE_CPU
    FORCE_CPU = args.cpu
    if args.tiny:
        args.size, args.images = 64, 32
        args.train_bs, args.infer_bs = 8, 8
        args.stage5_classes = 8

    wd = args.workdir
    if os.path.isdir(wd):
        shutil.rmtree(wd)
    root = os.path.join(wd, "imagenet")
    det = os.path.join(wd, "detections")
    stores = os.path.join(wd, "pseudo_labels")
    ckpt = os.path.join(wd, "ckpt")
    log(f"building {args.images} synthetic images at {args.size}px")
    build_dataset(root, det, args.images, args.size)

    common = ["--set",
              f"data.imagenet_root={root}",
              f"data.image_size={args.size}",
              f"paths.root={stores}",
              f"checkpoint_dir={ckpt}",
              "eval_every=0", "vis_every=0",
              "checkpoint_every=1000000000",
              "log_every=8"]
    tiny = ["--tiny"] if args.tiny else []
    # --num-queries exists only on the decoder-bearing stages
    nq = ["--num-queries", "16"] if args.tiny else []
    steps = max(args.images // args.train_bs, 2)
    bs = lambda n: [f"data.batch_size={n}"]

    stages = {}
    walls = {}

    stages["label"], walls["label"] = run_stage(
        "label", ["label", "--detections", det, *common, *bs(args.infer_bs)])
    stages["propose"], walls["propose"] = run_stage(
        "propose", ["propose", "--allow-random-init", *tiny, *common,
                    *bs(args.infer_bs)])
    stages["dcrf"], walls["dcrf"] = run_stage(
        "dcrf", ["dcrf", *common, *bs(args.infer_bs)])
    stages["train-proposal"], walls["train-proposal"] = run_stage(
        "train-proposal", ["train-proposal", *tiny, *nq, *common,
                           *bs(args.train_bs), f"max_iters={steps}"])
    stages["rank"], walls["rank"] = run_stage(
        "rank", ["rank", "--phases", "cluster,save", "--trainer-checkpoint",
                 os.path.join(ckpt, "proposal"), *tiny, *nq, *common,
                 *bs(args.infer_bs)])
    stages["train-distillation"], walls["train-distillation"] = run_stage(
        "train-distillation",
        ["train-distillation", "--num-object-classes",
         str(args.stage5_classes), "--trainer-checkpoint",
         os.path.join(ckpt, "proposal"), *tiny, *nq, *common,
         *bs(args.train_bs), f"max_iters={steps}"])

    # ---- compose
    n = args.images

    def steady(stage, key="images_per_sec_steady"):
        s = stages[stage] or {}
        v = s.get(key) or s.get("cluster", {}).get(key)
        return v

    # per-stage steady seconds for one pipeline pass of n images
    steady_s = {}
    for name in stages:
        if name == "label":
            # host-only store pass — charge its full wall (no compile)
            steady_s[name] = walls[name]
            continue
        if name == "rank":
            parts = [p for p in ("cluster", "save")
                     if isinstance(stages[name].get(p), dict)]
            steady_s[name] = sum(
                n / stages[name][p]["images_per_sec_steady"] for p in parts
                if stages[name][p].get("images_per_sec_steady"))
            continue
        rate = steady(name)
        n_stage = n
        if name.startswith("train"):
            n_stage = stages[name]["steps"] * args.train_bs  # one epoch
        steady_s[name] = (n_stage / rate) if rate else walls[name]

    total_steady = sum(steady_s.values())
    total_wall = sum(walls.values())
    store_mb = {os.path.basename(p): du_mb(os.path.join(stores, p))
                for p in (os.listdir(stores) if os.path.isdir(stores) else [])}

    detail = {
        "images": n,
        "per_stage": {
            k: {
                "wall_s": round(walls[k], 1),
                "steady_s": round(steady_s[k], 1),
                "share": round(steady_s[k] / total_steady, 3),
                "first_batch_s": (stages[k] or {}).get("first_batch_s"),
                "steady_img_per_s": steady(k),
            } for k in stages},
        "store_mb": store_mb,
        "total_wall_s": round(total_wall, 1),
        "pipeline_images_per_sec_wall": round(n / total_wall, 3),
    }
    print(json.dumps({"detail": detail}))
    ips = n / total_steady
    print(json.dumps({
        "metric": "pipeline_stages1to5_images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_COMPOSITE, 2),
    }))
    if not args.keep:
        shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
