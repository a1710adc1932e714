"""Profiler harness: trace capture + summary, and the `profile` CLI."""

import pytest
import json

from partdistillation_tpu import run as cli


@pytest.mark.slow  # compile-heavy: re-tiered out of the fast gate (VERDICT r3 #8)
def test_profile_cli_prints_breakdown(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cli.main(["profile", "--tiny", "--steps", "2", "--num-queries", "8",
              "--top", "5", "--set", "data.image_size=64",
              "data.batch_size=2", "data.mask_capacity=8",
              f"checkpoint_dir={tmp_path}/ckpt"])
    out = capsys.readouterr().out.strip().splitlines()
    res = json.loads(out[-1])
    assert res["stage"] == "profile"
    assert res["total_ms_per_step"] > 0
    assert len(res["top"]) > 0
    assert (tmp_path / "ckpt" / "profile").exists()


def test_trace_steps_and_summarize(tmp_path):
    import jax
    import jax.numpy as jnp

    from partdistillation_tpu.utils.profiling import (summarize_trace,
                                                      trace_steps)

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((256, 256))

    def step():
        float(f(x))

    d = trace_steps(step, str(tmp_path / "tr"), steps=2)
    summary = summarize_trace(d, steps=2)
    assert summary and sum(summary.values()) > 0


def test_doctor_cli(tmp_path, capsys, monkeypatch):
    """doctor: healthy CPU-backend environment -> ok=True, exit 0."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PYTHONPATH", "")
    cli.main(["doctor", "--backend-timeout", "120", "--set",
              f"paths.root={tmp_path}/pseudo",
              f"checkpoint_dir={tmp_path}/ckpt"])
    res = json.loads(capsys.readouterr().out)
    assert res["ok"] is True
    assert res["backend"]["ok"] is True
    assert res["backend"]["platform"] == "cpu"
    assert res["backend"]["devices"] >= 1
    assert res["pseudo_label_root"]["ok"] is True
