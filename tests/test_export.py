"""AOT export round trip: serialized artifact reproduces the live forward."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from rajni_tpu.export import export_model, load_exported
from rajni_tpu.models.vit import ViTConfig, init_params, vit_forward
from rajni_tpu.utils.schedule import normalize_schedule

CFG = ViTConfig(
    img_size=16, patch_size=8, embed_dim=32, depth=2, num_heads=4,
    num_classes=6,
)
SCHED = {1: {"keep_ratio": 0.5}}


def test_export_roundtrip(tmp_path, rng):
    params = init_params(jax.random.key(0), CFG, jnp.float32)
    path = str(tmp_path / "model.rajni")
    export_model(path, params, CFG, SCHED, batch=2, dtype=jnp.float32,
                 platform="cpu")

    serve = load_exported(path)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    got = np.asarray(serve(x))
    want = np.asarray(
        vit_forward(params, x, CFG, normalize_schedule(SCHED, CFG.depth))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_identity_schedule(tmp_path, rng):
    params = init_params(jax.random.key(1), CFG, jnp.float32)
    path = str(tmp_path / "base.rajni")
    export_model(path, params, CFG, None, batch=1, dtype=jnp.float32,
                 platform="cpu")
    serve = load_exported(path)
    out = serve(jnp.zeros((1, 16, 16, 3), jnp.float32))
    assert out.shape == (1, 6)


def test_export_platform_stamped(tmp_path, rng):
    """The artifact is pinned to an explicit target platform (ADVICE r1:
    platforms= was omitted, silently locking exports to the CI host)."""
    from jax import export as jexport

    params = init_params(jax.random.key(3), CFG, jnp.float32)
    path = str(tmp_path / "cpu.rajni")
    export_model(path, params, CFG, SCHED, batch=2, dtype=jnp.float32,
                 platform="cpu")
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    assert exported.platforms == ("cpu",)


def test_export_pallas_off_tpu_raises(tmp_path):
    """impl='pallas' would bake interpret-mode callbacks on a non-TPU host;
    must fail loudly rather than produce a broken artifact."""
    import pytest

    params = init_params(jax.random.key(4), CFG, jnp.float32)
    with pytest.raises(ValueError, match="pallas"):
        export_model(str(tmp_path / "x.rajni"), params, CFG, None,
                     batch=2, dtype=jnp.float32, impl="pallas")


def test_export_auto_resolves_against_target_platform(tmp_path):
    """impl='auto' + platform='cpu' must resolve to xla even at batch ≥ 8
    (resolution is against the target, not the export host)."""
    params = init_params(jax.random.key(5), CFG, jnp.float32)
    path = str(tmp_path / "auto_cpu.rajni")
    export_model(path, params, CFG, None, batch=16, dtype=jnp.float32,
                 impl="auto", platform="cpu")
    serve = load_exported(path)
    assert serve(jnp.zeros((16, 16, 16, 3), jnp.float32)).shape == (16, 6)


def test_export_dynamic_batch(tmp_path, rng):
    """batch='dynamic' (VERDICT r2 #7): ONE artifact serves any request
    size — multiple concrete batches through the same file, each matching
    the live forward, no padding."""
    params = init_params(jax.random.key(6), CFG, jnp.float32)
    path = str(tmp_path / "dyn.rajni")
    export_model(path, params, CFG, SCHED, batch="dynamic",
                 dtype=jnp.float32, platform="cpu")

    serve = load_exported(path)
    assert serve.dynamic_batch
    sched = normalize_schedule(SCHED, CFG.depth)
    for b in (1, 3, 7):
        x = jnp.asarray(rng.standard_normal((b, 16, 16, 3)), jnp.float32)
        got = np.asarray(serve(x))
        want = np.asarray(vit_forward(params, x, CFG, sched))
        assert got.shape == (b, 6)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_dynamic_batch_rejects_pallas(tmp_path):
    """Pallas kernel grids are static per batch; dynamic+pallas must fail
    loudly, and impl='auto' must resolve dynamic exports to xla."""
    import pytest

    params = init_params(jax.random.key(7), CFG, jnp.float32)
    with pytest.raises(ValueError, match="dynamic"):
        export_model(str(tmp_path / "x.rajni"), params, CFG, None,
                     batch="dynamic", dtype=jnp.float32, impl="pallas")
    # auto + tpu target + dynamic → xla (would raise otherwise off-TPU)
    export_model(str(tmp_path / "auto.rajni"), params, CFG, None,
                 batch="dynamic", dtype=jnp.float32, impl="auto",
                 platform="cpu")
    assert load_exported(str(tmp_path / "auto.rajni")).dynamic_batch


def test_export_fixed_batch_not_dynamic(tmp_path):
    params = init_params(jax.random.key(8), CFG, jnp.float32)
    path = str(tmp_path / "fixed.rajni")
    export_model(path, params, CFG, None, batch=2, dtype=jnp.float32,
                 platform="cpu")
    assert not load_exported(path).dynamic_batch


def test_export_cli_dynamic(tmp_path, capsys):
    """--batch dynamic via the CLI produces a polymorphic artifact."""
    import json

    from rajni_tpu.export import main
    from rajni_tpu.params.io import save_params

    params = init_params(jax.random.key(9), CFG, jnp.float32)
    ckpt = str(tmp_path / "p.msgpack")
    save_params(ckpt, params)
    out = str(tmp_path / "dyn_cli.rajni")
    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"1": {"keep_ratio": 0.5}}))

    from rajni_tpu.models.vit import VARIANTS

    VARIANTS["_export_toy"] = CFG
    try:
        main([ckpt, out, "--model", "_export_toy", "--schedule", str(sched),
              "--batch", "dynamic", "--dtype", "float32",
              "--platform", "cpu"])
    finally:
        del VARIANTS["_export_toy"]
    serve = load_exported(out)
    assert serve.dynamic_batch
    assert serve(jnp.zeros((5, 16, 16, 3), jnp.float32)).shape == (5, 6)


def test_export_cli(tmp_path, rng, capsys):
    """checkpoint → artifact → serve, via the CLI end to end."""
    import json

    from rajni_tpu.export import main
    from rajni_tpu.models.vit import get_config
    from rajni_tpu.params.io import save_params

    tiny_cfg = get_config("vit_tiny_patch16_224")
    params = init_params(jax.random.key(2), tiny_cfg, jnp.float32)
    ckpt = str(tmp_path / "p.msgpack")
    save_params(ckpt, params)
    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"3": {"keep_ratio": 0.9}}))
    out = str(tmp_path / "m.rajni")

    main([ckpt, out, "--model", "vit_tiny_patch16_224",
          "--schedule", str(sched), "--batch", "1", "--dtype", "float32",
          "--platform", "cpu"])
    assert "exported vit_tiny_patch16_224" in capsys.readouterr().out

    serve = load_exported(out)
    logits = serve(jnp.zeros((1, 224, 224, 3), jnp.float32))
    assert logits.shape == (1, 1000)


def test_export_with_static_act_scales(tmp_path, rng):
    """Quantized export with calibrated static scales (ActScales JSON
    round-trip + baked static head on the xla path)."""
    from rajni_tpu.quant import (
        ActScales,
        calibrate_act_scales,
        quantize_params,
    )

    params = init_params(jax.random.key(0), CFG, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    scales = calibrate_act_scales(params, x, CFG, SCHED)
    spath = str(tmp_path / "scales.json")
    scales.save(spath)
    loaded = ActScales.load(spath)
    assert loaded == scales  # frozen dataclass of plain floats

    q = quantize_params(params)
    path = str(tmp_path / "int8static.rajni")
    export_model(path, q, CFG, SCHED, batch=2, dtype=jnp.float32,
                 platform="cpu", impl="xla", act_scales=loaded)
    serve = load_exported(path)
    got = np.asarray(serve(x))
    want = np.asarray(
        jax.jit(vit_forward, static_argnums=(2, 3, 4, 5))(
            q, x, CFG, normalize_schedule(SCHED, CFG.depth), "xla", scales
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_multi_bucket_round_trip(tmp_path, rng):
    """batch=[2,4,8]: every request size runs — exact-bucket, padded,
    and chunked — and matches the live forward on the real rows."""
    params = init_params(jax.random.key(7), CFG, jnp.float32)
    path = str(tmp_path / "buckets.rajni")
    export_model(path, params, CFG, SCHED, batch=[8, 2, 4],
                 dtype=jnp.float32, platform="cpu")

    serve = load_exported(path)
    assert serve.buckets == [2, 4, 8]  # sorted + deduped
    assert serve.dynamic_batch is False
    assert serve.input_spec.shape[0] == 8  # largest bucket

    norm = normalize_schedule(SCHED, CFG.depth)
    for b in (1, 2, 3, 4, 7, 8, 11):  # pad, exact, and chunk (11 = 8+3)
        x = jnp.asarray(rng.standard_normal((b, 16, 16, 3)), jnp.float32)
        got = np.asarray(serve(x))
        assert got.shape == (b, CFG.num_classes), b
        want = np.asarray(vit_forward(params, x, CFG, norm))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f"batch {b}")


def test_export_single_artifact_has_no_buckets(tmp_path):
    params = init_params(jax.random.key(8), CFG, jnp.float32)
    path = str(tmp_path / "single.rajni")
    export_model(path, params, CFG, None, batch=2, dtype=jnp.float32,
                 platform="cpu")
    serve = load_exported(path)
    assert serve.buckets is None


def test_export_multi_bucket_validation(tmp_path):
    import pytest

    params = init_params(jax.random.key(9), CFG, jnp.float32)
    with pytest.raises(ValueError, match="positive"):
        export_model(str(tmp_path / "x.rajni"), params, CFG, None,
                     batch=[0, 4], dtype=jnp.float32, platform="cpu")


def test_export_cli_bucket_list(tmp_path, capsys):
    """--batch 2,4 on the CLI produces a bucket artifact."""
    from rajni_tpu.export import main
    from rajni_tpu.models.vit import get_config
    from rajni_tpu.params.io import save_params

    cfg = get_config("vit_tiny_patch16_64")  # grammar-parsed, 17 tokens
    params = init_params(jax.random.key(10), cfg, jnp.float32)
    ckpt = str(tmp_path / "p.msgpack")
    save_params(ckpt, params)
    out = str(tmp_path / "m.rajni")
    main([ckpt, out, "--model", "vit_tiny_patch16_64", "--batch", "2,4",
          "--dtype", "float32", "--kernels", "xla", "--platform", "cpu"])
    assert "exported" in capsys.readouterr().out
    assert load_exported(out).buckets == [2, 4]


def test_export_multi_bucket_int8(tmp_path, rng):
    """Buckets compose with int8-quantized params (xla route on CPU —
    dynamic activation scales baked per bucket program)."""
    from rajni_tpu.quant import quantize_params

    params = quantize_params(init_params(jax.random.key(11), CFG, jnp.float32))
    path = str(tmp_path / "q.rajni")
    export_model(path, params, CFG, SCHED, batch=[2, 4],
                 dtype=jnp.float32, platform="cpu")
    serve = load_exported(path)
    x = jnp.asarray(rng.standard_normal((3, 16, 16, 3)), jnp.float32)
    got = np.asarray(serve(x))
    assert got.shape == (3, CFG.num_classes)
    want = np.asarray(vit_forward(
        params, x, CFG, normalize_schedule(SCHED, CFG.depth)
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_export_cli_adapts_variant_checkpoint(tmp_path, rng, capsys):
    """The export CLI adapts the config to an extended-variant checkpoint
    (like the eval/train CLIs) — a distilled tree exported under the base
    model name must bake the dual-head semantics, not silently drop them."""
    import dataclasses
    import json

    from rajni_tpu.export import main
    from rajni_tpu.models.vit import VARIANTS
    from rajni_tpu.params.io import save_params

    dcfg = dataclasses.replace(CFG, distilled=True)
    params = init_params(jax.random.key(11), dcfg, jnp.float32)
    ckpt = str(tmp_path / "d.msgpack")
    save_params(ckpt, params)
    sched = tmp_path / "s.json"
    sched.write_text(json.dumps({"1": {"keep_ratio": 0.5}}))
    out = str(tmp_path / "d.rajni")

    VARIANTS["_export_toy"] = CFG  # base (non-distilled) name
    try:
        main([ckpt, out, "--model", "_export_toy", "--schedule", str(sched),
              "--batch", "2", "--dtype", "float32", "--platform", "cpu"])
    finally:
        del VARIANTS["_export_toy"]
    assert "distilled=True" in capsys.readouterr().out

    serve = load_exported(out)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    want = np.asarray(vit_forward(
        params, x, dcfg, normalize_schedule(SCHED, dcfg.depth)
    ))
    np.testing.assert_allclose(np.asarray(serve(x)), want,
                               rtol=1e-5, atol=1e-6)
