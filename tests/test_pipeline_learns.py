"""Pipeline-LEARNS quality gate (VERDICT r3 #4).

The smoke pipeline (test_cli_pipeline.py) asserts metrics are finite; this
module asserts the pipeline actually LEARNS: on structured synthetic data
whose parts are trivially separable (objects with a red left half and a
green right half at varied positions), the trained tiny stage-3 model must
beat the same evaluation run with random weights by a clear margin, and
clear an absolute floor. A silent regression that keeps losses finite but
stops learning fails this gate.

Reference analog: the evaluators-as-acceptance-tests strategy (SURVEY §4.3,
miou_evaluator.py:72-114) — AR@k / mIoU are the pipeline's oracle.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trains for real (hundreds of tiny steps)

from partdistillation_tpu import run as cli
from partdistillation_tpu.data.pseudo_store import ShardWriter
from partdistillation_tpu.utils import rle as rle_codec

N_IMAGES = 16
SIZE = 64


def _run(argv, capsys, stage=None):
    cli.main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    results = []
    for line in out:
        try:
            results.append(json.loads(line))
        except (ValueError, TypeError):
            continue
    if stage is not None:
        for r in results:
            if r.get("stage") == stage:
                return r
        raise AssertionError(f"no JSON line with stage={stage!r} in {out}")
    return results[-1]


@pytest.fixture(scope="module")
def learn_env(tmp_path_factory):
    """Synthetic two-part objects: red left half, green right half, varied
    geometry; GT part polygons match the halves exactly."""
    tmp = tmp_path_factory.mktemp("learns")
    root = tmp / "imagenet"
    from PIL import Image

    rng = np.random.RandomState(7)
    code = "n01440764"
    (root / code).mkdir(parents=True)
    (root / "labels.txt").write_text(f"{code} tench\n")

    det_dir = tmp / "detections"
    images, annotations, aid, objects, halves = [], [], 0, [], []
    with ShardWriter(str(det_dir), 0, 1) as w:
        for j in range(N_IMAGES):
            img = (rng.randint(100, 140, (SIZE, SIZE, 3))).astype(np.uint8)
            # object rectangle: varied position/size, even width
            h = int(rng.randint(24, 40))
            wdt = int(rng.randint(24, 40)) // 2 * 2
            y0 = int(rng.randint(4, SIZE - h - 4))
            x0 = int(rng.randint(4, SIZE - wdt - 4))
            xm = x0 + wdt // 2
            img[y0:y0 + h, x0:xm] = [200, 40, 40]       # part 0: red
            img[y0:y0 + h, xm:x0 + wdt] = [40, 200, 40]  # part 1: green
            Image.fromarray(img).save(str(root / code / f"{code}_{j}.JPEG"),
                                      quality=95)

            obj = np.zeros((SIZE, SIZE), bool)
            obj[y0:y0 + h, x0:x0 + wdt] = True
            objects.append(obj)
            left = np.zeros((SIZE, SIZE), bool)
            left[y0:y0 + h, x0:xm] = True
            right = np.zeros((SIZE, SIZE), bool)
            right[y0:y0 + h, xm:x0 + wdt] = True
            halves.append((left, right))
            w.write({"image_id": f"{code}_{j}",
                     "masks": [rle_codec.encode(obj)],
                     "scores": [0.95], "class_ids": [0]})

            images.append({"id": j, "file_name": f"{code}/{code}_{j}.JPEG",
                           "height": SIZE, "width": SIZE})
            for p, (xa, xb) in enumerate([(x0, xm), (xm, x0 + wdt)]):
                annotations.append({
                    "id": aid, "image_id": j, "category_id": p,
                    "segmentation": [[float(xa), float(y0), float(xb), float(y0),
                                      float(xb), float(y0 + h),
                                      float(xa), float(y0 + h)]]})
                aid += 1

    part_json = tmp / "part_imagenet.json"
    part_json.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": c, "name": f"part{c}"} for c in range(2)]}))

    work = tmp / "work"
    work.mkdir()
    os.chdir(str(work))
    overrides = [
        f"data.imagenet_root={root}",
        f"data.part_imagenet_json={part_json}",
        f"data.part_imagenet_images={root}",
        f"data.image_size={SIZE}",
        "data.batch_size=8",
        "data.mask_capacity=8",
        "data.num_workers=2",
        f"paths.root={tmp}/pseudo_labels",
        f"checkpoint_dir={tmp}/ckpt",
        "max_iters=200",
        "log_every=50",
        "checkpoint_every=10000",
    ]
    # a SECOND pseudo-label root whose "proposals" are the OBJECT rectangles:
    # training the tiny proposer on it yields an object detector — the shape
    # of the production stage-1 detect path (converted COCO/stage-3-on-
    # objects weights), giving eval-detect a meaningful synthetic gate
    obj_root = tmp / "pseudo_obj"
    with ShardWriter(str(obj_root / "proposals_dcrf"), 0, 1) as w:
        for j, obj in enumerate(objects):
            w.write({"image_id": f"{code}_{j}",
                     "part_masks": [rle_codec.encode(obj)],
                     "object_ratio": float(obj.mean()),
                     "object_class": 0})

    return {"tmp": tmp, "root": root, "det": det_dir, "overrides": overrides,
            "obj_root": obj_root, "halves": halves, "code": code}


def test_pipeline_learns_end_to_end(learn_env, capsys):
    ov = learn_env["overrides"]
    tmp = learn_env["tmp"]

    # stages 1-2b: label -> color k-means proposals -> dCRF color snapping
    _run(["label", "--detections", str(learn_env["det"]), "--set", *ov], capsys)
    _run(["propose", "--tiny", "--allow-random-init", "--num-clusters", "2",
          "--set", *ov], capsys)
    res = _run(["dcrf", "--iters", "5", "--set", *ov], capsys)
    assert res["saved"] == N_IMAGES

    # STAGE-2 QUALITY (VERDICT r4 #4): the dCRF'd k-means proposals must
    # actually recover the two colored halves — mean best-IoU of any
    # proposal against each GT half clears a floor, not just pass through.
    from partdistillation_tpu.data.pseudo_store import PseudoLabelStore

    store = PseudoLabelStore(str(tmp / "pseudo_labels/proposals_dcrf"))
    ious = []
    for j, (left, right) in enumerate(learn_env["halves"]):
        rec = store.get(f"{learn_env['code']}_{j}")
        assert rec is not None, f"image {j} missing from the dCRF store"
        props = [rle_codec.decode(r) for r in rec["part_masks"]]
        for gt in (left, right):
            best = max((np.logical_and(p, gt).sum() /
                        max(np.logical_or(p, gt).sum(), 1)) for p in props)
            ious.append(best)
    mean_iou = float(np.mean(ious))
    print(f"\n[learns] stage-2 proposal best-IoU vs GT halves: {mean_iou:.3f}")
    assert mean_iou >= 0.70, ious

    # stage 3: train the tiny proposal model on the pseudo-parts
    _run(["train-proposal", "--tiny", "--num-queries", "8",
          "--no-freeze-trunk", "--set", *ov], capsys)

    eval_args = ["eval-proposal", "--tiny", "--num-queries", "8",
                 "--topk", "8", "--set", *ov]
    chance = _run([*eval_args, "--allow-random-init"], capsys)
    trained = _run([*eval_args, "--trainer-checkpoint",
                    str(tmp / "ckpt/proposal")], capsys)
    # AR@k is percent. Floor: trained must beat random weights by a wide
    # margin AND clear an absolute bar (halves are trivially separable).
    k = max((int(key[3:]) for key in trained if key.startswith("AR@")))
    print(f"\n[learns] stage-3 AR@{k}: trained={trained[f'AR@{k}']:.1f} "
          f"chance={chance[f'AR@{k}']:.1f}")
    assert trained[f"AR@{k}"] >= 25.0, (trained, chance)
    assert trained[f"AR@{k}"] >= chance[f"AR@{k}"] + 10.0, (trained, chance)

    # stage-1 detector quality (the Detic-replacement claim's first
    # non-vacuous number, VERDICT r3 missing #1 within this env's limits):
    # train the same tiny proposer on the OBJECT rectangles (the production
    # detect path runs object-level weights, not part-level ones) and gate
    # its AR against object GT via the eval-detect CLI
    ov_obj = [o for o in ov
              if not (o.startswith("paths.root=")
                      or o.startswith("checkpoint_dir="))]
    ov_obj += [f"paths.root={learn_env['obj_root']}",
               f"checkpoint_dir={tmp}/ckpt_obj"]
    _run(["train-proposal", "--tiny", "--num-queries", "8",
          "--no-freeze-trunk", "--set", *ov_obj], capsys)
    det_args = ["eval-detect", "--tiny", "--num-queries", "8",
                "--topk", "8", "--set", *ov_obj]
    det_chance = _run([*det_args, "--allow-random-init"], capsys,
                      stage="eval-detect")
    det_trained = _run([*det_args, "--trainer-checkpoint",
                        str(tmp / "ckpt_obj/proposal")], capsys,
                       stage="eval-detect")
    kd = max((int(key[3:]) for key in det_trained if key.startswith("AR@")))
    print(f"[learns] stage-1 detect AR@{kd}: "
          f"trained={det_trained[f'AR@{kd}']:.1f} "
          f"chance={det_chance[f'AR@{kd}']:.1f}")
    assert det_trained[f"AR@{kd}"] >= 40.0, (det_trained, det_chance)
    assert det_trained[f"AR@{kd}"] >= det_chance[f"AR@{kd}"] + 15.0, (
        det_trained, det_chance)

    # stages 4-5: rank with the trained model, distill, evaluate mIoU
    rank_args = ["--tiny", "--num-queries", "8", "--num-clusters", "2",
                 "--num-gt-parts", "2", "--set", *ov]
    _run(["rank", *rank_args, "--phases", "cluster,save",
          "--trainer-checkpoint", str(tmp / "ckpt/proposal")], capsys)

    # STAGE-4 QUALITY (VERDICT r4 #4): cluster purity — the 2 clusters must
    # separate the red/green halves. For every saved part instance, find the
    # GT side it covers; a cluster's purity is the majority side's share.
    store4 = PseudoLabelStore(str(tmp / "pseudo_labels/part_masks_with_class"))
    side_counts = {}  # cluster label -> [left hits, right hits]
    n_parts = 0
    for j, (left, right) in enumerate(learn_env["halves"]):
        rec = store4.get(f"{learn_env['code']}_{j}")
        if rec is None:
            continue
        for rle, lab in zip(rec["part_masks"], rec["part_labels"]):
            m = rle_codec.decode(rle)
            il = np.logical_and(m, left).sum()
            ir = np.logical_and(m, right).sum()
            if il + ir == 0:
                continue
            side_counts.setdefault(int(lab), [0, 0])[0 if il >= ir else 1] += 1
            n_parts += 1
    assert n_parts >= N_IMAGES, f"too few ranked parts saved ({n_parts})"
    purity = sum(max(c) for c in side_counts.values()) / n_parts
    print(f"[learns] stage-4 cluster purity over {n_parts} parts "
          f"({len(side_counts)} clusters): {purity:.3f}")
    assert purity >= 0.90, side_counts
    _run(["train-distillation", "--tiny", "--no-freeze-trunk", "--num-queries", "8",
          "--num-parts", "2", "--num-object-classes", "1", "--set", *ov],
         capsys)

    ev_args = ["distill-eval", "--tiny", "--num-queries", "8",
               "--num-parts", "2", "--num-object-classes", "1", "--topk", "8",
               "--num-gt-parts", "2", "--set", *ov]
    chance5 = _run([*ev_args, "--allow-random-init"], capsys,
                   stage="distill-eval")
    trained5 = _run([*ev_args, "--trainer-checkpoint",
                     str(tmp / "ckpt/part_distillation")], capsys,
                    stage="distill-eval")
    print(f"[learns] stage-5 C-mIoU: trained={trained5['C-mIoU']:.3f} "
          f"chance={chance5['C-mIoU']:.3f}")
    # Ratchet (VERDICT r4 #4): measured round 5 under shipped defaults —
    # trained C-mIoU 79.7, chance 32.5 (percent scale). Floor = just below
    # 0.8x the measured value (seed margin), plus a real trained-vs-chance
    # gap; the old 0.25 floor was vacuous against a 32.5 chance.
    assert trained5["C-mIoU"] >= 60.0, (trained5, chance5)
    assert trained5["C-mIoU"] >= chance5["C-mIoU"] + 25.0, (trained5, chance5)
