"""REAL multi-process distributed tests: 2 localhost jax.distributed
processes on the CPU backend exercising the evaluators' cross-host merge
paths end-to-end (all_gather_objects -> merge), the plumbing the virtual
single-process mesh cannot reach. Replaces trust in `# pragma: no cover -
multihost only` branches with an actual 2-host run.
"""

import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast gate (-m 'not slow')

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_two(prog: str, timeout: int = 240):
    """Launch `prog` (expects argv[1] = process id) twice; returns both
    stdouts. The program must call jax.distributed.initialize itself."""
    env = {"PYTHONPATH": "", "JAX_PLATFORMS": "cpu",
           "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
           "HOME": os.environ.get("HOME", "/root")}
    procs = [subprocess.Popen([sys.executable, "-c", prog, str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
    return outs


_PRELUDE = textwrap.dedent("""
    import os, sys, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    jax.distributed.initialize("localhost:{port}", num_processes=2,
                               process_id=pid)
    sys.path.insert(0, {repo!r})
    import numpy as np
""")



def test_all_gather_objects_two_hosts():
    prog = _PRELUDE.format(port=15731, repo=_REPO) + textwrap.dedent("""
        from partdistillation_tpu.engine.launch import all_gather_objects
        got = all_gather_objects({"host": pid, "payload": "x" * (100 * (pid + 1))})
        assert [g["host"] for g in got] == [0, 1], got
        assert len(got[1]["payload"]) == 200
        print("OK", pid)
    """)
    outs = _run_two(prog)
    assert all("OK" in o for o in outs)



def test_miou_matcher_confusion_merge_two_hosts():
    """Each host sees a different object class; after allreduce both hosts
    hold the union of confusion matrices (miou.py _ConfusionAccumulator)."""
    prog = _PRELUDE.format(port=15732, repo=_REPO) + textwrap.dedent("""
        from partdistillation_tpu.evaluation.miou import MIoUMatcher
        m = MIoUMatcher(pred_classes=2, gt_classes=2, distributed=True)
        masks = np.zeros((1, 1, 8, 8), bool); masks[..., :4, :] = True
        outputs = {"pred_masks": masks, "pred_labels": np.zeros((1, 1), np.int32),
                   "valid": np.ones((1, 1), bool)}
        m.process(outputs, masks, np.zeros((1, 1), np.int32),
                  np.ones((1, 1), bool), np.asarray([pid]))
        mapping = m.evaluate()
        # each host contributed one object class; the merge carries both
        conf = m._acc.conf
        assert sorted(conf.keys()) == [0, 1], conf.keys()
        assert conf[0].sum() > 0 and conf[1].sum() > 0
        print("OK", pid, sorted(mapping.keys()))
    """)
    outs = _run_two(prog)
    assert all("OK" in o for o in outs)



def test_clustering_module_reservoir_merge_two_hosts():
    """ClusteringModule(distributed=True): per-host reservoirs merge across
    hosts before k-means; both hosts end with identical centroid banks that
    reflect BOTH hosts' features."""
    prog = _PRELUDE.format(port=15733, repo=_REPO) + textwrap.dedent("""
        from partdistillation_tpu.evaluation.clustering import ClusteringModule
        cm = ClusteringModule(num_object_classes=2, feat_dim=4, num_clusters=2,
                              capacity_per_class=16, distributed=True, seed=0)
        rng = np.random.RandomState(pid)
        # host 0 only sees class 0; host 1 only sees class 1
        feats = rng.randn(1, 6, 4).astype(np.float32) + 10.0 * pid
        cm.process({"feats": feats, "valid": np.ones((1, 6), bool)},
                   object_class=np.asarray([pid], np.int64))
        bank = cm.evaluate()
        assert bank.shape == (2, 2, 4)
        # both classes populated on BOTH hosts after the merge
        assert np.abs(bank[0]).sum() > 0 and np.abs(bank[1]).sum() > 0, bank
        print("OK", pid, round(float(np.abs(bank).sum()), 3))
    """)
    outs = _run_two(prog)
    assert all("OK" in o for o in outs)
    # identical bank checksum on both hosts
    s0 = [ln for ln in outs[0].splitlines() if ln.startswith("OK")][0].split()[-1]
    s1 = [ln for ln in outs[1].splitlines() if ln.startswith("OK")][0].split()[-1]
    assert s0 == s1, (s0, s1)
