"""`dcrf --watch` continuous mode: runs alongside stage 2 and exits via the
completion-marker protocol (the reference's dCRF worker farm,
continuously_postprocess_dcrf.py:121-127, minus the kill-by-hand).

Scenario: propose shard 0/2 finishes first, the watcher starts and refines
those records, THEN shard 1/2 lands late — the watcher must pick up the late
records and exit on its own once both shards' markers are present.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (subprocess jit of dense_crf)

from partdistillation_tpu import run as cli
from partdistillation_tpu.data.pseudo_store import (
    PseudoLabelStore,
    ShardWriter,
    mark_shard_complete,
    store_complete,
)
from partdistillation_tpu.utils import rle as rle_codec


def test_store_complete_marker_protocol(tmp_path):
    d = str(tmp_path / "store")
    os.makedirs(d)
    assert not store_complete(d)
    mark_shard_complete(d, 0, 2)
    assert not store_complete(d)
    mark_shard_complete(d, 1, 2)
    assert store_complete(d)


def test_reopened_writer_clears_stale_done_marker(tmp_path):
    """A resumed producer must invalidate the prior run's completion claim:
    otherwise a concurrent `dcrf --watch` drains the old records and exits
    while the resumed run is still appending (ADVICE r4 medium)."""
    d = str(tmp_path / "store")
    # run 1: write + complete both shards
    with ShardWriter(d, 0, 2) as w:
        w.write({"image_id": "a"})
    mark_shard_complete(d, 0, 2)
    with ShardWriter(d, 1, 2) as w:
        w.write({"image_id": "b"})
    mark_shard_complete(d, 1, 2)
    assert store_complete(d)
    # run 2 resumes shard 0: its stale marker must drop until re-marked
    w = ShardWriter(d, 0, 2)
    assert not store_complete(d)
    w.write({"image_id": "c"})
    w.close()
    mark_shard_complete(d, 0, 2)
    assert store_complete(d)
    assert sorted(PseudoLabelStore(d).ids()) == ["a", "b", "c"]


def test_dcrf_watch_late_arrival(tmp_path, capsys):
    codes = ["n01440764", "n01443537"]
    root = tmp_path / "imagenet"
    from PIL import Image

    rng = np.random.RandomState(0)
    for ci, code in enumerate(codes):
        d = root / code
        d.mkdir(parents=True)
        for j in range(2):
            img = rng.randint(0, 255, (64, 64, 3), np.uint8)
            img[16:52, 12:48] = [60 + 80 * ci, 160, 220 - 60 * ci]
            Image.fromarray(img).save(str(d / f"{code}_{j}.JPEG"))
    (root / "labels.txt").write_text("n01440764 tench\nn01443537 goldfish\n")

    det_dir = tmp_path / "detections"
    with ShardWriter(str(det_dir), 0, 1) as w:
        for ci, code in enumerate(codes):
            for j in range(2):
                m = np.zeros((64, 64), bool)
                m[16:52, 12:48] = True
                w.write({"image_id": f"{code}_{j}",
                         "masks": [rle_codec.encode(m)],
                         "scores": [0.9], "class_ids": [ci]})

    ov = [f"data.imagenet_root={root}", "data.image_size=64",
          "data.batch_size=2", "data.mask_capacity=8", "data.num_workers=0",
          f"paths.root={tmp_path}/pseudo_labels",
          f"checkpoint_dir={tmp_path}/ckpt"]
    os.chdir(str(tmp_path))

    cli.main(["label", "--detections", str(det_dir), "--set", *ov])
    # first half arrives: shard 0 of 2 (classes are partition-sliced)
    cli.main(["propose", "--tiny", "--allow-random-init",
              "--shard", "0", "--num-shards", "2", "--set", *ov])
    capsys.readouterr()
    assert not store_complete(f"{tmp_path}/pseudo_labels/proposal_generation")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    watcher = subprocess.Popen(
        [sys.executable, "-m", "partdistillation_tpu.run", "dcrf",
         "--watch", "--watch-interval", "0.5", "--iters", "2", "--set", *ov],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    try:
        # wait until the watcher has refined the first shard's records
        dcrf_dir = f"{tmp_path}/pseudo_labels/proposals_dcrf"
        deadline = time.time() + 240
        while time.time() < deadline:
            store = PseudoLabelStore(dcrf_dir)
            if any(iid.startswith(codes[0]) for iid in store.ids()):
                break
            if watcher.poll() is not None:
                break
            time.sleep(0.5)
        else:
            pytest.fail("watcher never refined the first shard's records")
        assert watcher.poll() is None, (
            "watcher exited before upstream completed: "
            + watcher.stderr.read()[-2000:])

        # the LATE records: shard 1 of 2 lands while the watcher is running.
        # Written directly (deterministic clean rectangles) rather than via
        # `propose --allow-random-init`, whose random-init masks dCRF can
        # legitimately smooth away to nothing — this test is about the watch
        # protocol, not model quality.
        prop_dir = f"{tmp_path}/pseudo_labels/proposal_generation"
        with ShardWriter(prop_dir, 1, 2) as w:
            for j in range(2):
                m = np.zeros((64, 64), bool)
                m[16:52, 12:48] = True
                w.write({"image_id": f"{codes[1]}_{j}",
                         "part_masks": [rle_codec.encode(m)],
                         "object_ratio": float(m.mean()),
                         "object_class": 1})
        mark_shard_complete(prop_dir, 1, 2)
        assert store_complete(prop_dir)

        out, err = watcher.communicate(timeout=240)
    except subprocess.TimeoutExpired:
        watcher.kill()
        out, err = watcher.communicate()
        pytest.fail("dcrf --watch did not exit after upstream completion; "
                    f"stderr tail: {err[-2000:]}")
    finally:
        if watcher.poll() is None:
            watcher.kill()
            watcher.communicate()

    assert watcher.returncode == 0, f"watcher failed: {err[-2000:]}"
    result = json.loads(out.strip().splitlines()[-1])
    assert result["stage"] == "dcrf"
    assert result["saved"] == 4  # both shards, including the late arrivals
    store = PseudoLabelStore(f"{tmp_path}/pseudo_labels/proposals_dcrf")
    for ci, code in enumerate(codes):
        for j in range(2):
            assert f"{code}_{j}" in store


def test_store_complete_mixed_totals(tmp_path):
    """Markers from different shard totals don't cross-satisfy: only a
    complete SET for some one total counts."""
    d = str(tmp_path / "store")
    os.makedirs(d)
    mark_shard_complete(d, 0, 3)
    mark_shard_complete(d, 1, 2)  # different sharding scheme
    assert not store_complete(d)
    mark_shard_complete(d, 0, 2)
    assert store_complete(d)  # {0,1} of 2 complete, 3-scheme still partial
