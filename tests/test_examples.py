"""Smoke tests for the examples/ scripts — run each as a real subprocess
(hermetic CPU env) so the documented entry points cannot rot."""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(extra=None):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",  # hermetic: never init the tunnel plugin
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    env.update(extra or {})
    return env


def _imgs(tmp_path, n=2, px=100):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(
            rng.integers(0, 256, (px, px, 3), dtype=np.uint8), "RGB"
        ).save(p)
        paths.append(str(p))
    return paths


def test_example_classify(tmp_path):
    import json

    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "classify.py"),
         "--model", "vit_tiny_patch16_64", "--schedule", str(sched)]
        + _imgs(tmp_path),
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=560,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "img0.png" in out.stdout


def test_example_pipeline_inference():
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "examples", "pipeline_inference.py")],
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=560,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "mesh" in out.stdout


def test_example_serve_demo(tmp_path):
    art = tmp_path / "demo.rajni"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "serve.py"),
         str(art), "--demo"] + _imgs(tmp_path),
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=560,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert art.exists()
    assert "top-5 classes" in out.stdout


def test_acc_demo_mini(tmp_path):
    """scripts/acc_demo.py end-to-end at mini scale: dataset generation ->
    train CLI -> compare_base eval CLI -> fine-tune through the schedule ->
    artifact. Accuracy at 2 steps is chance; this pins the PIPELINE (the
    north-star accuracy protocol), not the number."""
    import json

    out = tmp_path / "acc.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "acc_demo.py"),
         "--work_dir", str(tmp_path / "work"),
         "--train_per_class", "4", "--val_per_class", "2",
         "--steps", "2", "--finetune_steps", "2", "--batch_size", "4",
         "--out", str(out)],
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(out.read_text())
    assert rec["train_images"] == 32 and rec["val_images"] == 16
    assert 0.0 <= rec["base_top1"] <= 100.0
    assert rec["top1_drop_pct"] == pytest.approx(
        rec["base_top1"] - rec["pruned_top1"], abs=1e-2
    )
    assert "finetuned_pruned_top1" in rec


def test_example_token_map(tmp_path):
    import json

    sched = tmp_path / "s.json"
    sched.write_text(json.dumps(
        {"1": {"keep_ratio": 0.6}, "2": {"keep_ratio": 0.8}}
    ))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "token_map.py"),
         _imgs(tmp_path, n=1)[0],
         "--model", "vit_tiny_patch16_64", "--schedule", str(sched)],
        capture_output=True, text=True, env=_env(), cwd=REPO, timeout=560,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "token_counts" in out.stdout
    # one grid line per patch row, mixing kept and dropped marks
    assert "#" in out.stdout and "." in out.stdout
    assert "block 1" in out.stdout and "block 2" in out.stdout
