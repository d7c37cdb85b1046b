"""CLI driver tests: flag surface, reference error parity, end-to-end main."""

from __future__ import annotations

import json

import pytest

from rajni_tpu.run import get_args, main, resolve_kernels


def test_defaults_match_reference():
    """Reference defaults (run.py:18-43): batch 256, workers 8, warmup 5,
    model vit_base_patch16_224."""
    args = get_args([])
    assert args.batch_size == 256
    assert args.num_workers == 8
    assert args.warmup == 5
    assert args.model == "vit_base_patch16_224"
    assert args.max_batches is None
    assert not args.compare_base


def test_missing_schedule_raises(tmp_path):
    """Reference parity: --schedule is required (run.py:115-116)."""
    with pytest.raises(ValueError, match="must provide --schedule"):
        main(["--synthetic", "1", "--batch_size", "2",
              "--model", "vit_tiny_patch16_224", "--warmup", "0"])


def test_missing_data_source_raises():
    with pytest.raises(ValueError, match="--data_path or --synthetic"):
        main(["--schedule", "x.json"])


def test_resolve_kernels_cpu():
    assert resolve_kernels("auto") in ("xla", "pallas")
    assert resolve_kernels("xla") == "xla"
    assert resolve_kernels("pallas") == "pallas"


def test_main_end_to_end_synthetic(tmp_path, capsys):
    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    result = main([
        "--synthetic", "2", "--batch_size", "4", "--max_batches", "1",
        "--model", "vit_tiny_patch16_224", "--schedule", str(sched),
        "--warmup", "1", "--dtype", "float32", "--compare_base",
    ])
    assert "speedup" in result and "acc_drop" in result
    out = capsys.readouterr().out
    assert "Token counts per block" in out
    assert "Speedup" in out


def test_schedule_inspector(tmp_path, capsys):
    from rajni_tpu.utils.schedule import main as sched_main

    sched = tmp_path / "s.json"
    sched.write_text(json.dumps(
        {"3": {"keep_ratio": 0.95, "update": False},
         "4": {"keep_ratio": 0.95}, "5": {"keep_ratio": 0.85},
         "6": {"keep_ratio": 0.85}, "7": {"keep_ratio": 0.95}}))
    sched_main([str(sched)])
    info = json.loads(capsys.readouterr().out)
    assert info["token_counts"] == [
        197, 197, 197, 197, 187, 177, 150, 127, 120, 120, 120, 120]
    assert 0.8 < info["token_work_ratio"] < 0.83


def test_main_data_parallel_synthetic(tmp_path):
    """CLI --data_parallel end-to-end on the 8-device CPU mesh."""
    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    result = main([
        "--synthetic", "2", "--batch_size", "8", "--max_batches", "1",
        "--model", "vit_tiny_patch16_224", "--schedule", str(sched),
        "--warmup", "0", "--dtype", "float32", "--data_parallel",
    ])
    assert "rajni" in result


def test_main_preprocess_device_modes(tmp_path):
    """--preprocess host/device/device-full agree end-to-end on a real
    ImageFolder: same accuracy, all three code paths compile and run.
    'device' is bit-exact vs host (geometry identical, normalize on-chip);
    'device-full' re-derives the resample in-graph (±1/255 per pass) —
    argmax-stable on this tiny model either way."""
    import numpy as np
    from PIL import Image

    data = tmp_path / "data"
    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = data / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 256, (300, 260, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{i}.png")
    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))

    results = {}
    for mode in ("host", "device", "device-full"):
        results[mode] = main([
            "--data_path", str(data), "--batch_size", "3",
            "--model", "vit_tiny_patch16_224", "--schedule", str(sched),
            "--warmup", "0", "--dtype", "float32", "--num_workers", "1",
            "--preprocess", mode,
        ])["rajni"][0]
    assert results["host"] == results["device"]
    assert results["host"] == results["device-full"]

    # device modes compose with --data_parallel (VERDICT r2 missing #3):
    # the uint8/canvas batch shards over the 8-device mesh, same accuracy
    for mode in ("device", "device-full"):
        dp_acc = main([
            "--data_path", str(data), "--batch_size", "3",
            "--model", "vit_tiny_patch16_224", "--schedule", str(sched),
            "--warmup", "0", "--dtype", "float32", "--num_workers", "1",
            "--preprocess", mode, "--data_parallel",
        ])["rajni"][0]
        assert dp_acc == results[mode]


def test_main_quantize_end_to_end(tmp_path):
    """CLI --quantize runs the full-int8 path end-to-end (synthetic)."""
    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    result = main([
        "--synthetic", "2", "--batch_size", "4", "--max_batches", "1",
        "--model", "vit_tiny_patch16_224", "--schedule", str(sched),
        "--warmup", "0", "--dtype", "float32", "--quantize",
    ])
    assert "rajni" in result


def test_main_quantize_calibrate_end_to_end(tmp_path, capsys):
    """CLI --quantize --calibrate N runs the calibrated static-scale int8
    path end-to-end (rajni_tpu.quant.calibrate_act_scales), including the
    base comparison (each model calibrates with its own schedule)."""
    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    result = main([
        "--synthetic", "2", "--batch_size", "4", "--max_batches", "1",
        "--model", "vit_tiny_patch16_224", "--schedule", str(sched),
        "--warmup", "0", "--dtype", "float32", "--quantize",
        "--calibrate", "1", "--compare_base",
    ])
    out = capsys.readouterr().out
    assert "Captured 1 calibration batches" in out
    assert "Calibrated static int8 activation scales (base forward)" in out
    assert "Calibrated static int8 activation scales (pruned forward)" in out
    assert "rajni" in result and "base" in result


def test_main_calibrate_requires_quantize():
    with pytest.raises(ValueError, match="--calibrate requires --quantize"):
        main(["--synthetic", "1", "--calibrate", "2", "--schedule", "x"])


def test_main_load_scales_round_trip(tmp_path, capsys):
    """--save_scales then --load_scales: the second run consumes the file
    instead of calibrating (the calibrate-once/serve-anywhere flow; the
    only static path allowed under --distributed)."""
    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    scales = tmp_path / "scales.json"
    main([
        "--synthetic", "2", "--batch_size", "4", "--max_batches", "1",
        "--model", "vit_tiny_patch16_224", "--schedule", str(sched),
        "--warmup", "0", "--dtype", "float32", "--quantize",
        "--calibrate", "1", "--save_scales", str(scales),
    ])
    capsys.readouterr()
    result = main([
        "--synthetic", "2", "--batch_size", "4", "--max_batches", "1",
        "--model", "vit_tiny_patch16_224", "--schedule", str(sched),
        "--warmup", "0", "--dtype", "float32", "--quantize",
        "--load_scales", str(scales),
    ])
    out = capsys.readouterr().out
    assert f"Loaded static int8 activation scales from {scales}" in out
    assert "Calibrated static" not in out  # no recalibration happened
    assert "rajni" in result

    with pytest.raises(ValueError, match="mutually exclusive"):
        main(["--synthetic", "1", "--schedule", str(sched), "--quantize",
              "--calibrate", "1", "--load_scales", str(scales)])
    with pytest.raises(ValueError, match="requires --quantize"):
        main(["--synthetic", "1", "--schedule", str(sched),
              "--load_scales", str(scales)])
    bad = tmp_path / "bad_scales.json"
    bad.write_text(json.dumps(
        {"blocks": [[1.0, 1.0, 1.0, 1.0]] * 3, "head": 1.0}
    ))
    with pytest.raises(ValueError, match="calibrate with the serving"):
        main(["--synthetic", "1", "--schedule", str(sched), "--quantize",
              "--model", "vit_tiny_patch16_224",
              "--load_scales", str(bad)])


def test_calibrate_save_scales_export_pipeline(tmp_path, capsys):
    """The full PTQ deployment pipeline: eval-CLI calibration writes the
    scales JSON; the export CLI bakes them into a quantized artifact."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rajni_tpu.export import load_exported
    from rajni_tpu.export import main as export_main
    from rajni_tpu.models.vit import get_config, init_params
    from rajni_tpu.params.io import save_params

    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    scales = tmp_path / "scales.json"
    main([
        "--synthetic", "2", "--batch_size", "4", "--max_batches", "1",
        "--model", "vit_tiny_patch16_224", "--schedule", str(sched),
        "--warmup", "0", "--dtype", "float32", "--quantize",
        "--calibrate", "1", "--save_scales", str(scales),
    ])
    assert scales.exists()

    ckpt = tmp_path / "p.msgpack"
    cfg = get_config("vit_tiny_patch16_224")
    save_params(str(ckpt), init_params(jax.random.key(0), cfg, jnp.float32))
    art = tmp_path / "m.rajni"
    export_main([
        str(ckpt), str(art), "--model", "vit_tiny_patch16_224",
        "--schedule", str(sched), "--batch", "2", "--dtype", "float32",
        "--quantize", "--act_scales", str(scales),
        "--kernels", "xla", "--platform", "cpu",
    ])
    out = load_exported(str(art))(jnp.zeros((2, 224, 224, 3), jnp.float32))
    assert out.shape == (2, cfg.num_classes)
    assert np.isfinite(np.asarray(out)).all()


def test_main_tensor_parallel_synthetic(tmp_path):
    """CLI --tensor_parallel 2 end-to-end: Megatron TP over a (data=4,
    model=2) mesh on the 8-device CPU mesh (rajni_tpu.parallel.mesh)."""
    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    result = main([
        "--synthetic", "2", "--batch_size", "8", "--max_batches", "1",
        "--model", "vit_small_patch16_224", "--schedule", str(sched),
        "--warmup", "0", "--dtype", "float32", "--kernels", "xla",
        "--tensor_parallel", "2",
    ])
    assert "rajni" in result


def test_main_pipeline_parallel_synthetic(tmp_path, capsys):
    """CLI --pipeline_parallel 2 end-to-end: GPipe over a (data=4, pipe=2)
    mesh, and the 3-D composition with --tensor_parallel 2 (data=2)."""
    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    base_args = [
        "--synthetic", "2", "--batch_size", "8", "--max_batches", "1",
        "--schedule", str(sched), "--warmup", "0", "--dtype", "float32",
    ]
    result = main(base_args + [
        "--model", "vit_tiny_patch16_224", "--pipeline_parallel", "2",
    ])
    assert "rajni" in result

    result = main(base_args + [
        "--model", "vit_small_patch16_224", "--pipeline_parallel", "2",
        "--tensor_parallel", "2",
    ])
    assert "rajni" in result


def test_main_pipeline_preprocess_device_matches_host(tmp_path):
    """--preprocess device composes with --pipeline_parallel: the uint8
    batch normalizes in-graph inside the pipelined program. The pipeline
    is bit-exact vs single-device and device-normalize is bit-exact vs
    host, so accuracy matches the plain host run exactly."""
    import numpy as np
    from PIL import Image

    data = tmp_path / "data"
    rng = np.random.default_rng(1)
    for cls in ("a", "b"):
        d = data / cls
        d.mkdir(parents=True)
        for i in range(2):
            arr = rng.integers(0, 256, (280, 250, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{i}.png")
    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    common = [
        "--data_path", str(data), "--batch_size", "4",
        "--model", "vit_tiny_patch16_224", "--schedule", str(sched),
        "--warmup", "0", "--dtype", "float32", "--num_workers", "1",
    ]
    host_acc = main(common + ["--preprocess", "host"])["rajni"][0]
    pp_acc = main(common + [
        "--preprocess", "device", "--pipeline_parallel", "2",
    ])["rajni"][0]
    assert pp_acc == host_acc


def test_main_parallel_flag_validation(tmp_path):
    """TP/PP flag interplay rejections (each before any heavy work)."""
    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    base = ["--synthetic", "1", "--schedule", str(sched),
            "--model", "vit_tiny_patch16_224"]
    with pytest.raises(ValueError, match="not supported"):
        main(base + ["--distributed", "--tensor_parallel", "2"])
    with pytest.raises(ValueError, match="not supported"):
        main(base + ["--distributed", "--pipeline_parallel", "2"])
    with pytest.raises(ValueError, match="plain bf16/f32"):
        main(base + ["--quantize", "--pipeline_parallel", "2"])
    with pytest.raises(ValueError, match="device-full"):
        main(base + ["--preprocess", "device-full",
                     "--pipeline_parallel", "2"])


def test_main_artifact_eval(tmp_path, capsys):
    """--artifact: the exported serving program gets the full harness —
    real ImageFolder, ragged final batch padded on device, same accounting.
    The artifact numbers must match evaluating the SAME params live."""
    import numpy as np
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from rajni_tpu.export import export_model
    from rajni_tpu.models.vit import get_config, init_params
    from rajni_tpu.params.io import save_params
    from rajni_tpu.run import main

    data = tmp_path / "data"
    rng = np.random.default_rng(3)
    for cls in ("a", "b"):
        d = data / cls
        d.mkdir(parents=True)
        for i in range(2):
            arr = rng.integers(0, 256, (90, 80, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{i}.png")

    cfg = get_config("vit_tiny_patch16_64")
    params = init_params(jax.random.key(0), cfg, jnp.float32)
    sched = {3: {"keep_ratio": 0.7}}
    art = tmp_path / "m.rajni"
    export_model(str(art), params, cfg, sched, batch=3,  # 4 imgs -> pad path
                 dtype=jnp.float32, platform="cpu")

    acc_art, _ = main(["--artifact", str(art), "--data_path", str(data),
                       "--warmup", "1", "--preprocess", "host"])
    printed = capsys.readouterr().out
    assert "Artifact model: top-1" in printed
    assert "loader batch follows the artifact (3)" in printed

    # live evaluation of the same params/schedule for the accuracy anchor
    import json as _json

    ckpt = tmp_path / "p.msgpack"
    save_params(str(ckpt), params)
    sj = tmp_path / "s.json"
    sj.write_text(_json.dumps({"3": {"keep_ratio": 0.7}}))
    main(["--data_path", str(data), "--checkpoint", str(ckpt),
          "--model", "vit_tiny_patch16_64", "--schedule", str(sj),
          "--dtype", "float32", "--kernels", "xla", "--warmup", "1",
          "--batch_size", "3"])
    live = capsys.readouterr().out
    import re

    live_acc = float(
        re.search(r"RAJNI - Accuracy: (\d+\.\d+)%", live).group(1)
    )
    assert abs(acc_art - live_acc) < 1e-6


def test_main_artifact_flag_rejections(tmp_path):
    import pytest

    from rajni_tpu.run import main

    art = tmp_path / "x.rajni"
    art.write_bytes(b"not read before validation")
    with pytest.raises(ValueError, match="baked program"):
        main(["--artifact", str(art), "--schedule", "s.json",
              "--synthetic", "1"])
    with pytest.raises(ValueError, match="normalized float"):
        main(["--artifact", str(art), "--synthetic", "1",
              "--preprocess", "device"])


def test_main_artifact_rejects_kernels_override(tmp_path):
    import pytest

    from rajni_tpu.run import main

    art = tmp_path / "x.rajni"
    art.write_bytes(b"unread")
    with pytest.raises(ValueError, match="baked program"):
        main(["--artifact", str(art), "--synthetic", "1",
              "--kernels", "xla"])
