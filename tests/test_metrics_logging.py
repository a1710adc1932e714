"""MetricLogger: JSONL always, TensorBoard when available, rank-0 gating."""

import json
import os

from partdistillation_tpu.engine.metrics import MetricLogger, print_csv_format


def test_metric_logger_jsonl_and_tb(tmp_path):
    log_dir = str(tmp_path / "logs")
    mlog = MetricLogger(log_dir, enabled=True)
    mlog.log({"loss": 1.5, "grad_norm": 0.3}, step=1)
    mlog.log({"loss": 1.2}, step=2)
    mlog.close()

    lines = [json.loads(l) for l in open(os.path.join(log_dir, "metrics.jsonl"))]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 1.5
    assert lines[1]["step"] == 2 and "wall" in lines[1]
    # tensorboard event files written (torch.utils.tensorboard is available)
    tb_dir = os.path.join(log_dir, "tb")
    assert os.path.isdir(tb_dir) and os.listdir(tb_dir)


def test_metric_logger_disabled_writes_nothing(tmp_path):
    log_dir = str(tmp_path / "off")
    mlog = MetricLogger(log_dir, enabled=False)
    mlog.log({"loss": 1.0}, step=1)
    mlog.close()
    assert not os.path.exists(os.path.join(log_dir, "metrics.jsonl"))


def test_print_csv_format(capsys):
    out = print_csv_format({"mIoU": 12.345, "AR@100": 7.0}, task="t")
    captured = capsys.readouterr().out
    assert "AR@100,mIoU" in captured
    assert "7.0000,12.3450" in captured
    assert out.startswith("[t] metrics:")
