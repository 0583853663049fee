"""End-to-end CLI coverage (L3 entry points, SURVEY.md §1): the
train -> evaluate -> export_torch chain driven exactly as a user would,
one smoke-scale run on the CPU mesh."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(argv, env_extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Force the child CLIs onto CPU: without PALLAS_AXON_POOL_IPS the site
    # hook never registers the axon backend (and never pins the
    # jax_platforms CONFIG), so the env var alone decides the platform.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    r = subprocess.run(
        [sys.executable, "-m"] + argv,
        capture_output=True, text=True, cwd=_REPO, env=env, timeout=1800,
    )
    assert r.returncode == 0, f"{argv} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


@pytest.mark.slow
def test_train_evaluate_export_chain(tmp_path):
    save_dir = str(tmp_path / "runs")
    out = _run(["scripts.train", "--preset", "smoke",
                "--save-dir", save_dir, "--seed", "3"])
    assert "done:" in out and "val_iou=" in out

    run_dir = os.path.join(save_dir, "UNet", "run-001")
    files = set(os.listdir(run_dir))
    assert {"loss.csv", "model_settings.json", "model_1.npz"} <= files
    with open(os.path.join(run_dir, "model_settings.json")) as f:
        settings = json.load(f)
    assert settings["model"] == "UNet"

    ckpt = os.path.join(run_dir, "model_1.npz")
    out = _run([
        "scripts.evaluate", "--preset", "smoke", "--ckpt", ckpt,
        "--batch-size", "8", "--robustness-int", "--plot",
        "--out-dir", str(tmp_path),
    ])
    assert "clean:" in out
    scores = str(tmp_path / "results" / "robustness_scores.csv")
    rows = open(scores).read().strip().splitlines()
    assert rows[0] == "perturbation_type,param_value,mean_dice"
    assert len(rows) == 81  # 8 perturbations x 10 params + header
    assert os.path.getsize(str(tmp_path / "results" / "predictions.png")) > 0

    sd_path = str(tmp_path / "sd.pt")
    out = _run(["scripts.export_torch", "--ckpt", ckpt,
                "--model", "unet", "--out", sd_path])
    assert "tensors" in out
    import torch

    sd = torch.load(sd_path)
    assert "input.weight" in sd and "bottleneck.conv.0.weight" in sd
