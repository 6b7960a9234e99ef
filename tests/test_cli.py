"""CLI smoke: synth → datagen → train → index round-trip via the argparse
entry points (serving covered live in test_serving.py)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["TPUREC_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    return subprocess.run(
        [sys.executable, "-m", "tpurec.cli", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900,
    )


@pytest.mark.slow
def test_cli_full_journey(tmp_path):
    r = run_cli(
        "synth", "--family", "tabular", "--out", "raw", "--n-events", "8000",
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli("datagen", "--family", "tabular", "--raw", "raw", "--out", "gen", cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    cfg = {
        "model": {"name": "fm", "embedding": {"dim": 4}},
        "train": {
            "batch_size": 128, "epochs": 1, "log_every_steps": 0,
            "compute_dtype": "float32",
        },
    }
    (tmp_path / "exp.json").write_text(json.dumps(cfg))
    r = run_cli(
        "train", "--config", "exp.json", "--data", "gen", "--workdir", "run",
        cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "run" / "export" / "params.msgpack").exists()
    assert (tmp_path / "run" / "report.json").exists()
    # FM has no towers — index must refuse clearly
    r = run_cli(
        "index", "--export", "run/export", "--data", "gen", "--out", "idx",
        cwd=tmp_path,
    )
    assert r.returncode != 0
    assert "two-tower" in (r.stderr + r.stdout)
