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
    export_model(path, params, CFG, SCHED, batch=2, dtype=jnp.float32)

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
    export_model(path, params, CFG, None, batch=1, dtype=jnp.float32)
    serve = load_exported(path)
    out = serve(jnp.zeros((1, 16, 16, 3), jnp.float32))
    assert out.shape == (1, 6)


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
          "--schedule", str(sched), "--batch", "1", "--dtype", "float32"])
    assert "exported vit_tiny_patch16_224" in capsys.readouterr().out

    serve = load_exported(out)
    logits = serve(jnp.zeros((1, 224, 224, 3), jnp.float32))
    assert logits.shape == (1, 1000)
