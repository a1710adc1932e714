"""Eval/inference CLIs refuse to run with freshly-initialized weights.

The reference forces an explicit MODEL.WEIGHTS at every eval entry point;
our guard lives in run._restore_params(require_weights=True) and is opened
only by --allow-random-init (VERDICT r2 weak #4).
"""

import numpy as np
import pytest

from partdistillation_tpu import run as cli
from partdistillation_tpu.run import _restore_params


def test_restore_params_requires_weights():
    with pytest.raises(SystemExit, match="allow-random-init"):
        _restore_params(None, lambda: {"w": np.zeros(2)}, require_weights=True)


def test_restore_params_allow_random_warns(caplog):
    import logging

    with caplog.at_level(logging.WARNING, logger="partdistillation_tpu"):
        params = _restore_params(None, lambda: {"w": np.zeros(2)},
                                 require_weights=True, allow_random=True)
    assert "RANDOM WEIGHTS" in caplog.text
    assert "w" in params


def test_restore_params_train_path_unaffected():
    # trainers seed from fresh init without any flag
    params = _restore_params(None, lambda: {"w": np.zeros(2)})
    assert "w" in params


@pytest.fixture()
def mini_imagenet(tmp_path):
    from PIL import Image

    root = tmp_path / "imagenet"
    d = root / "n01440764"
    d.mkdir(parents=True)
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        str(d / "n01440764_0.JPEG"))
    (root / "labels.txt").write_text("n01440764 tench\n")
    return root


def test_detect_cli_refuses_random_init(mini_imagenet, tmp_path):
    with pytest.raises(SystemExit) as e:
        cli.main([
            "detect", "--tiny", "--num-queries", "4",
            "--set", f"data.imagenet_root={mini_imagenet}",
            f"paths.root={tmp_path / 'out'}", "data.image_size=32",
        ])
    assert "allow-random-init" in str(e.value.code)


def test_fit_mesh_logs_idle_devices(caplog):
    import logging

    with caplog.at_level(logging.WARNING, logger="partdistillation_tpu"):
        mesh = cli._fit_mesh(batch_size=12)  # gcd(8, 12) = 4 -> 4 idle
    assert mesh.devices.size == 4
    assert "IDLE" in caplog.text
