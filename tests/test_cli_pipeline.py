"""End-to-end five-stage pipeline through the CLI on synthetic data.

The TPU-native analog of the reference's debug-mode smoke runs
(SURVEY.md §4.2): label -> propose -> dcrf -> train-proposal -> rank
(cluster+save) -> train-distillation, all with --tiny models, on one
synthetic ImageNet mini-split, chained through the pseudo-label stores.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast gate (-m 'not slow')

from partdistillation_tpu import run as cli
from partdistillation_tpu.data.pseudo_store import PseudoLabelStore, ShardWriter
from partdistillation_tpu.utils import rle as rle_codec


@pytest.fixture(scope="module")
def pipeline_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipeline")
    root = tmp / "imagenet"
    from PIL import Image

    rng = np.random.RandomState(0)
    for ci, code in enumerate(["n01440764", "n01443537"]):
        d = root / code
        d.mkdir(parents=True)
        for j in range(4):
            img = rng.randint(0, 255, (64, 64, 3), np.uint8)
            # paint a colored object region so dCRF/k-means have structure
            img[16:52, 12:48] = [60 + 80 * ci, 160, 220 - 60 * ci]
            Image.fromarray(img).save(str(d / f"{code}_{j}.JPEG"))
    (root / "labels.txt").write_text("n01440764 tench\nn01443537 goldfish\n")

    # synthetic stage-1 detections store (the external-detector contract)
    det_dir = tmp / "detections"
    items_per_class = 4
    with ShardWriter(str(det_dir), 0, 1) as w:
        for ci, code in enumerate(["n01440764", "n01443537"]):
            for j in range(items_per_class):
                m = np.zeros((64, 64), bool)
                m[16:52, 12:48] = True
                noise = np.zeros((64, 64), bool)
                noise[:10, :10] = True
                w.write({
                    "image_id": f"{code}_{j}",
                    "masks": [rle_codec.encode(m), rle_codec.encode(noise)],
                    "scores": [0.9, 0.4],
                    "class_ids": [ci, 1 - ci],
                })

    # synthetic PartImageNet-style GT (same images, COCO part polygons) for
    # the eval entry points; synset codes match the imagenet root so the
    # global-vocabulary mapping resolves
    images, annotations = [], []
    aid = 0
    for ci, code in enumerate(["n01440764", "n01443537"]):
        for j in range(4):
            iid = ci * 4 + j
            images.append({"id": iid, "file_name": f"{code}/{code}_{j}.JPEG",
                           "height": 64, "width": 64})
            for p in range(2):
                annotations.append({
                    "id": aid, "image_id": iid, "category_id": (ci + p) % 3,
                    "segmentation": [[12.0 + 18 * p, 16.0, 30.0 + 18 * p, 16.0,
                                      30.0 + 18 * p, 52.0, 12.0 + 18 * p, 52.0]]})
                aid += 1
    part_json = tmp / "part_imagenet.json"
    part_json.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": c, "name": f"part{c}"} for c in range(3)]}))

    cfgdir = tmp / "work"
    cfgdir.mkdir()
    os.chdir(str(cfgdir))
    overrides = [
        f"data.imagenet_root={root}",
        f"data.part_imagenet_json={part_json}",
        f"data.part_imagenet_images={root}",
        "data.image_size=64",
        "data.batch_size=4",
        "data.mask_capacity=8",
        "data.num_workers=2",
        f"paths.root={tmp}/pseudo_labels",
        f"checkpoint_dir={tmp}/ckpt",
        "max_iters=2",
        "log_every=1",
        "checkpoint_every=1000",
    ]
    return {"tmp": tmp, "root": root, "det": det_dir, "overrides": overrides}


def _run(argv, capsys, stage=None):
    """Run the CLI; return the last JSON line (or the one whose "stage"
    matches, for subcommands that print per-phase results)."""
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


def test_stage1_label(pipeline_env, capsys):
    ov = pipeline_env["overrides"]
    res = _run(["label", "--detections", str(pipeline_env["det"]),
                "--set", *ov], capsys)
    assert res["saved"] == 8
    store = PseudoLabelStore(str(pipeline_env["tmp"] / "pseudo_labels/object_labels"))
    rec = store.get("n01440764_0")
    # class-matched detection ranked first
    assert rec["scores"][0] == pytest.approx(0.9)
    assert rec["pred_classes"][0] == 0
    # idempotent resume: rerun saves nothing
    res2 = _run(["label", "--detections", str(pipeline_env["det"]),
                 "--set", *ov], capsys)
    assert res2["saved"] == 0 and res2["skipped"] == 8


def test_stage2_propose(pipeline_env, capsys):
    ov = pipeline_env["overrides"]
    res = _run(["propose", "--tiny", "--allow-random-init", "--set", *ov], capsys)
    assert res["saved"] == 8
    store = PseudoLabelStore(str(pipeline_env["tmp"] / "pseudo_labels/proposal_generation"))
    rec = store.get("n01440764_0")
    assert 1 <= len(rec["part_masks"]) <= 4
    assert 0.0 < rec["object_ratio"] <= 1.0


def test_stage2b_dcrf(pipeline_env, capsys):
    ov = pipeline_env["overrides"]
    res = _run(["dcrf", "--iters", "2", "--set", *ov], capsys)
    assert res["saved"] == 8
    store = PseudoLabelStore(str(pipeline_env["tmp"] / "pseudo_labels/proposals_dcrf"))
    rec = store.get("n01443537_1")
    assert len(rec["part_masks"]) >= 1
    m = rle_codec.decode(rec["part_masks"][0])
    assert m.shape == (64, 64)


def test_stage3_train_proposal(pipeline_env, capsys):
    ov = pipeline_env["overrides"]
    res = _run(["train-proposal", "--tiny", "--num-queries", "8",
                "--no-freeze-trunk", "--set", *ov, "vis_every=2"], capsys)
    assert res["steps"] >= 2
    # VIS_PERIOD parity: an overlay collage of the live train batch exists
    vis = pipeline_env["tmp"] / "ckpt/logs/train-proposal/vis/step_000002.png"
    assert vis.exists()
    from PIL import Image

    arr = np.asarray(Image.open(str(vis)))
    assert arr.ndim == 3 and arr.shape[0] >= 64 and arr.shape[1] >= 128


def test_stage4_rank_cluster_save(pipeline_env, capsys):
    ov = pipeline_env["overrides"]
    res = _run(["rank", "--tiny", "--num-queries", "8", "--num-clusters", "3",
                "--phases", "cluster,save", "--allow-random-init",
                "--set", *ov], capsys)
    assert res["phases"] == ["cluster", "save"]
    cents = np.load(str(pipeline_env["tmp"] / "ckpt/rank_centroids.npz"))["centroids"]
    assert cents.shape == (2, 3, 32)  # (object classes, k, hidden)
    store = PseudoLabelStore(
        str(pipeline_env["tmp"] / "pseudo_labels/part_masks_with_class"))
    assert len(store) == 8
    rec = next(iter(store))
    assert len(rec["part_masks"]) == len(rec["part_labels"]) == len(rec["part_scores"])
    assert all(0 <= l < 3 for l in rec["part_labels"])


def test_stage3_eval_proposal(pipeline_env, capsys):
    """Trained-proposal AR eval entry point (part_proposal_train_net.py:90-126):
    loads the stage-3 trainer checkpoint and prints AR@k."""
    ov = pipeline_env["overrides"]
    res = _run(["eval-proposal", "--tiny", "--num-queries", "8", "--topk", "8",
                "--trainer-checkpoint",
                str(pipeline_env["tmp"] / "ckpt/proposal"),
                "--set", *ov], capsys)
    assert res["dataset"] == "part_imagenet"
    assert "AR@1" in res and np.isfinite(res["AR@1"])
    assert res["# instances"] == 8


def test_stage4_rank_match_eval(pipeline_env, capsys):
    """Majority-vote matching + mIoU eval phases on the GT part set."""
    ov = pipeline_env["overrides"]
    res = _run(["rank", "--tiny", "--num-queries", "8", "--num-clusters", "3",
                "--phases", "match,eval", "--num-gt-parts", "3",
                "--allow-random-init", "--set", *ov], capsys, stage="rank-eval")
    assert res["stage"] == "rank-eval"
    assert np.isfinite(res["C-mIoU"])
    mapping = np.load(str(pipeline_env["tmp"] / "ckpt/rank_mapping.npz"))["mapping"]
    assert mapping.shape == (2, 3)
    assert ((mapping >= 0) & (mapping < 3)).all()


def test_stage5_train_distillation(pipeline_env, capsys):
    ov = pipeline_env["overrides"]
    res = _run(["train-distillation", "--tiny", "--no-freeze-trunk", "--num-queries", "8",
                "--num-parts", "3", "--num-object-classes", "4",
                "--set", *ov], capsys)
    assert res["steps"] >= 2


def test_stage5_distill_save(pipeline_env, capsys):
    """Stage-5 save pass writes final predictions to paths.predictions
    (part_distillation_model.py:290-311)."""
    ov = pipeline_env["overrides"]
    res = _run(["distill-save", "--tiny", "--num-queries", "8",
                "--num-parts", "3", "--num-object-classes", "4", "--topk", "8",
                "--trainer-checkpoint",
                str(pipeline_env["tmp"] / "ckpt/part_distillation"),
                "--set", *ov], capsys)
    assert res["saved"] == 8
    store = PseudoLabelStore(
        str(pipeline_env["tmp"] / "pseudo_labels/part_distillation_predictions"))
    assert len(store) == 8
    rec = next(iter(store))
    assert len(rec["part_masks"]) == len(rec["part_labels"]) == len(rec["part_scores"])
    assert all(0 <= l < 3 for l in rec["part_labels"])


def test_stage5_distill_eval(pipeline_env, capsys):
    """Stage-5 match+eval: majority-vote mapping then mIoU on GT parts
    (part_distillation_model.py:470-472)."""
    ov = pipeline_env["overrides"]
    res = _run(["distill-eval", "--tiny", "--num-queries", "8",
                "--num-parts", "3", "--num-object-classes", "4", "--topk", "8",
                "--num-gt-parts", "3", "--allow-random-init",
                "--set", *ov], capsys)
    assert res["stage"] == "distill-eval"
    assert np.isfinite(res["C-mIoU"])
    mapping = np.load(str(pipeline_env["tmp"] / "ckpt/distill_mapping.npz"))["mapping"]
    assert mapping.shape == (4, 3)


def test_stage5_warm_start_from_stage3(pipeline_env, capsys):
    """Cross-stage warm-start: train-distillation initialized from the
    TRAINED stage-3 trainer checkpoint (the reference's MODEL.WEIGHTS
    contract with detectron2's shape-mismatch skip: shared trunk/decoder
    leaves graft, the stage-5-only giant head keeps its init)."""
    ov = [o for o in pipeline_env["overrides"]
          if not o.startswith("checkpoint_dir=")]
    ov += [f"checkpoint_dir={pipeline_env['tmp']}/ckpt_warm"]
    res = _run(["train-distillation", "--tiny", "--no-freeze-trunk", "--num-queries", "8",
                "--num-parts", "3", "--num-object-classes", "4",
                "--trainer-checkpoint",
                str(pipeline_env["tmp"] / "ckpt/proposal"),
                "--set", *ov], capsys)
    assert res["steps"] >= 2
    assert (pipeline_env["tmp"] / "ckpt_warm/part_distillation").exists()


def test_config_presets_load():
    """Every shipped YAML preset parses into a valid PipelineConfig with
    _BASE_ inheritance resolved."""
    import glob

    from partdistillation_tpu.config import PipelineConfig, load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(cli.__file__)))
    presets = glob.glob(os.path.join(repo, "configs", "**", "*.yaml"), recursive=True)
    assert len(presets) >= 7
    for p in presets:
        cfg = load_config(PipelineConfig, p)
        assert cfg.data.image_size in (64, 640)
        assert cfg.data.batch_size >= 1
    tiny = load_config(PipelineConfig,
                       os.path.join(repo, "configs", "debug", "tiny.yaml"))
    assert tiny.max_iters == 2 and tiny.data.debug_limit == 16
    stage3 = load_config(PipelineConfig,
                         os.path.join(repo, "configs", "proposal_learning", "swinL_640.yaml"))
    assert stage3.max_iters == 50000
    # overlays win last
    over = load_config(PipelineConfig,
                       os.path.join(repo, "configs", "proposal_learning", "swinL_640.yaml"),
                       ["max_iters=7"])
    assert over.max_iters == 7


def test_stage1_detect_from_pixels(pipeline_env, capsys):
    """The in-framework detector (segmenter proposals, class-agnostic without
    CLIP) produces object masks from PIXELS into the stage-1 store layout
    (labeling_detic.py analog; detect writes where label reads)."""
    tmp = pipeline_env["tmp"]
    ov = [o if not o.startswith("paths.root=") else
          f"paths.root={tmp}/pseudo_labels_detect" for o in pipeline_env["overrides"]]
    res = _run(["detect", "--tiny", "--num-queries", "8", "--proposals", "8",
                "--topk", "5", "--no-class-match", "--allow-random-init",
                "--set", *ov], capsys)
    assert res["stage"] == "detect"
    assert res["saved"] == 8
    store = PseudoLabelStore(str(tmp / "pseudo_labels_detect/object_labels"))
    rec = store.get("n01440764_0")
    assert 1 <= len(rec["object_masks"]) <= 5
    m = rle_codec.decode(rec["object_masks"][0])
    assert m.shape == (64, 64) and m.any()
    assert rec["scores"] == sorted(rec["scores"], reverse=True)


def test_stage1_eval_detect(pipeline_env, capsys):
    """Stage-1 detection quality is MEASURABLE: AR@k of the detect path's
    object-mask proposals against PartImageNet OBJECT GT (the first number on
    the Detic-replacement claim; the reference never scores its stage 1)."""
    ov = pipeline_env["overrides"]
    res = _run(["eval-detect", "--tiny", "--num-queries", "8", "--topk", "8",
                "--trainer-checkpoint",
                str(pipeline_env["tmp"] / "ckpt/proposal"),
                "--set", *ov], capsys, stage="eval-detect")
    assert res["dataset"] == "part_imagenet"
    assert "AR@1" in res and np.isfinite(res["AR@1"])
    # one object instance per synthetic image
    assert res["# instances"] == 8
