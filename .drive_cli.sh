set -e
TMP=$(mktemp -d)
ROOT=$TMP/imagenet
python - <<PY
import numpy as np, os
from PIL import Image
from partdistillation_tpu.data.pseudo_store import ShardWriter
from partdistillation_tpu.utils import rle as rle_codec
root = "$ROOT"
rng = np.random.RandomState(0)
for ci, code in enumerate(["n01440764", "n01443537"]):
    d = os.path.join(root, code); os.makedirs(d)
    for j in range(4):
        img = rng.randint(0, 255, (64, 64, 3), np.uint8)
        img[16:52, 12:48] = [60 + 80*ci, 160, 220 - 60*ci]
        Image.fromarray(img).save(os.path.join(d, f"{code}_{j}.JPEG"))
open(os.path.join(root, "labels.txt"), "w").write("n01440764 tench\nn01443537 goldfish\n")
with ShardWriter("$TMP/detections", 0, 1) as w:
    for ci, code in enumerate(["n01440764", "n01443537"]):
        for j in range(4):
            m = np.zeros((64, 64), bool); m[16:52, 12:48] = True
            w.write({"image_id": f"{code}_{j}", "masks": [rle_codec.encode(m)],
                     "scores": [0.9], "class_ids": [ci]})
print("synthetic data ready:", "$TMP")
PY
OV="data.imagenet_root=$ROOT data.image_size=64 data.batch_size=4 data.num_workers=2 paths.root=$TMP/pl checkpoint_dir=$TMP/ckpt max_iters=2 log_every=1"
python -m partdistillation_tpu.run label --detections $TMP/detections --set $OV
python -m partdistillation_tpu.run propose --tiny --set $OV
python -m partdistillation_tpu.run dcrf --iters 2 --set $OV
python -m partdistillation_tpu.run rank --tiny --num-queries 8 --num-clusters 3 --phases cluster,save --set $OV
python - <<PY
from partdistillation_tpu.data.pseudo_store import PseudoLabelStore
st = PseudoLabelStore("$TMP/pl/part_masks_with_class")
rec = next(iter(st))
print("final store:", len(st), "records; first:", len(rec["part_masks"]), "parts, labels", rec["part_labels"])
assert len(st) == 8
PY
echo CLI-DRIVE-OK
