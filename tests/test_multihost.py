"""Real 2-process distributed-merge tests over jax.distributed on localhost.

The evaluators' cross-host merges (pickled-object gather + pure merge
functions) run in no single-process test by construction; here two actual CPU
processes rendezvous through a Gloo coordinator and must agree on the merged
result — the TPU-native analog of the reference's multi-node GLOO gathers
(detectron2 comm.all_gather, SURVEY.md §2.7).
"""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address=sys.argv[2],
                           num_processes=2, process_id=pid)
import numpy as np
from partdistillation_tpu.engine.launch import all_gather_objects
from partdistillation_tpu.evaluation.miou import MIoUMatcher
from partdistillation_tpu.evaluation.proposal_evaluator import ProposalEvaluator
from partdistillation_tpu.evaluation.clustering import ClusteringModule

# 1) raw object gather, ragged payloads
out = all_gather_objects({"pid": pid, "arr": np.arange(3 + pid)})
assert [o["pid"] for o in out] == [0, 1]
assert len(out[1]["arr"]) == 4

# 2) MIoUMatcher: each host sees a different object class; merged votes must
# cover both classes identically on both hosts
m = MIoUMatcher(pred_classes=2, gt_classes=2, distributed=True)
masks = np.zeros((1, 2, 8, 8)); masks[0, 0, :4] = 1; masks[0, 1, 4:] = 1
classes = np.array([[0, 1]])
gt_classes = np.array([[pid, 1 - pid]])  # hosts disagree on GT labels
m.process({"pred_masks": masks, "pred_labels": classes,
           "valid": np.ones((1, 2), bool)},
          masks, gt_classes, np.ones((1, 2), bool), np.array([pid]))
votes = m.evaluate()
assert set(votes) == {0, 1}, votes
assert votes[0].tolist() == [0, 1] and votes[1].tolist() == [1, 0]

# 3) ProposalEvaluator: ragged per-host record lists concatenate
ev = ProposalEvaluator(limits=(1,), distributed=True)
n = 1 + pid  # host 0: 1 record, host 1: 2 records
pred = np.zeros((n, 3, 8, 8), bool); pred[:, 0, :4] = True
ev.process({"pred_masks": pred, "scores": np.ones((n, 3)),
            "valid": np.ones((n, 3), bool)},
           pred[:, :1], np.ones((n, 1), bool))
res = ev.evaluate()
assert res["# instances"] == 3.0, res
assert res["AR@1"] == 100.0

# 4) ClusteringModule: per-host class slices merge into one identical bank
cm = ClusteringModule(num_object_classes=2, feat_dim=4, num_clusters=2,
                      capacity_per_class=16, distributed=True)
feats = np.full((1, 8, 4), float(pid + 1), np.float32)
feats[0, 4:] *= -1.0
cm.process({"feats": feats, "valid": np.ones((1, 8), bool)}, np.array([pid]))
bank = cm.evaluate()
assert bank.shape == (2, 2, 4)
digest = float(np.abs(bank).sum())
digests = all_gather_objects(digest)
assert digests[0] == digests[1], digests

print(f"proc {pid}: all distributed merges OK", flush=True)
"""


def test_two_process_distributed_merges(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("XLA_FLAGS", None)  # workers don't need the 8-device mesh
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), coord],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(outs)
    assert "all distributed merges OK" in outs[0]
