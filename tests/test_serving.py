"""Dynamic-batching serving engine + HTTP front-end (rajni_tpu.serving).

The engine must (a) return exactly the logits the underlying artifact
produces, (b) actually coalesce concurrent requests into shared device
calls, (c) survive a failing batch without wedging the worker, and (d)
speak the documented HTTP surface. All on the CPU mesh with tiny exports.
"""

from __future__ import annotations

import http.client
import io
import json
import threading

import numpy as np

import jax
import jax.numpy as jnp

from rajni_tpu.data.device import normalize_images
from rajni_tpu.export import export_model, load_exported
from rajni_tpu.models.vit import ViTConfig, init_params
from rajni_tpu.serving import BatchingEngine, make_server

CFG = ViTConfig(
    img_size=16, patch_size=8, embed_dim=32, depth=2, num_heads=4,
    num_classes=6,
)
SCHED = {1: {"keep_ratio": 0.5}}


def _artifact(tmp_path, batch, name="m.rajni"):
    params = init_params(jax.random.key(0), CFG, jnp.float32)
    path = str(tmp_path / name)
    export_model(path, params, CFG, SCHED, batch=batch, dtype=jnp.float32,
                 platform="cpu")
    return load_exported(path)


def _crops(rng, n):
    return [rng.integers(0, 256, (16, 16, 3), np.uint8) for _ in range(n)]


def test_engine_matches_direct(tmp_path, rng):
    serve = _artifact(tmp_path, batch=4)
    crops = _crops(rng, 3)
    with BatchingEngine(serve, max_delay_ms=20.0) as eng:
        futs = [eng.submit(c) for c in crops]
        got = np.stack([f.result(timeout=30) for f in futs])

    # the engine's documented path: device-normalize, pad to the fixed
    # batch with zeros, slice the logits back
    norm = normalize_images(jnp.asarray(np.stack(crops)), jnp.float32)
    padded = jnp.concatenate([norm, jnp.zeros((1, 16, 16, 3), jnp.float32)])
    want = np.asarray(serve(padded), np.float32)[:3]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_engine_coalesces_queued_requests(tmp_path, rng):
    serve = _artifact(tmp_path, batch=4)
    eng = BatchingEngine(serve, max_delay_ms=5.0, autostart=False)
    futs = [eng.submit(c) for c in _crops(rng, 3)]
    eng.start()  # all three were queued before the worker woke: ONE batch
    for f in futs:
        f.result(timeout=30)
    eng.stop()
    snap = eng.stats.snapshot()
    assert snap["requests"] == 3
    assert snap["batches"] == 1
    assert snap["mean_batch"] == 3.0
    assert snap["p99_ms"] >= snap["p50_ms"] > 0.0


def test_engine_chunks_past_max_batch(tmp_path, rng):
    serve = _artifact(tmp_path, batch=2)  # engine max_batch defaults to 2
    eng = BatchingEngine(serve, max_delay_ms=5.0, autostart=False)
    assert eng.max_batch == 2
    futs = [eng.submit(c) for c in _crops(rng, 5)]
    eng.start()
    rows = [f.result(timeout=30) for f in futs]
    eng.stop()
    assert all(r.shape == (6,) for r in rows)
    snap = eng.stats.snapshot()
    assert snap["requests"] == 5
    assert snap["batches"] == 3  # 2 + 2 + 1


def test_engine_multi_bucket(tmp_path, rng):
    serve = _artifact(tmp_path, batch=[2, 4], name="b.rajni")
    crops = _crops(rng, 3)
    with BatchingEngine(serve, max_delay_ms=20.0) as eng:
        assert eng.max_batch == 4  # largest bucket
        got = np.stack(
            [f.result(timeout=30) for f in [eng.submit(c) for c in crops]]
        )
    norm = normalize_images(jnp.asarray(np.stack(crops)), jnp.float32)
    want = np.asarray(serve(norm), np.float32)  # bucket loader pads/slices
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_engine_warmup_compiles_all_buckets(tmp_path, rng):
    serve = _artifact(tmp_path, batch=[2, 4], name="w.rajni")
    calls = []
    inner = serve

    def spy(x):
        calls.append(int(x.shape[0]))
        return inner(x)

    spy.buckets = inner.buckets
    spy.dynamic_batch = inner.dynamic_batch
    spy.input_spec = inner.input_spec
    with BatchingEngine(spy, max_delay_ms=1.0) as eng:
        eng.warmup()
        assert calls == [2, 4]  # one zeros batch per bucket program
        assert eng.stats.snapshot()["requests"] == 0  # stats unpolluted
        eng.classify(_crops(rng, 1)[0])  # still serves afterwards


def test_engine_validates_requests(tmp_path, rng):
    serve = _artifact(tmp_path, batch=2)
    with BatchingEngine(serve) as eng:
        try:
            eng.submit(np.zeros((8, 8, 3), np.uint8))
            raise AssertionError("wrong shape accepted")
        except ValueError:
            pass
        try:
            eng.submit(np.zeros((16, 16, 3), np.float32))
            raise AssertionError("float input accepted on a uint8 engine")
        except ValueError:
            pass


def test_engine_failed_batch_recovers(rng):
    calls = []

    def flaky(x):  # plain callable: no input_spec, accepts any batch
        calls.append(int(x.shape[0]))
        if x.shape[0] == 2:
            raise RuntimeError("boom")
        return jnp.zeros((x.shape[0], 6), jnp.float32)

    eng = BatchingEngine(flaky, max_delay_ms=5.0, normalize=False,
                         autostart=False)
    img = np.zeros((16, 16, 3), np.float32)
    bad = [eng.submit(img), eng.submit(img)]  # coalesce into the size-2 batch
    eng.start()
    for f in bad:
        try:
            f.result(timeout=30)
            raise AssertionError("failed batch returned a result")
        except RuntimeError:
            pass
    ok = eng.submit(img)  # the worker must still be alive
    assert ok.result(timeout=30).shape == (6,)
    eng.stop()
    assert calls[0] == 2


def test_http_multi_model_registry(tmp_path, rng):
    """Two artifacts behind one server: per-model routing, default model,
    registry listing, per-model + aggregate stats."""
    pruned = _artifact(tmp_path, batch=2, name="pruned.rajni")
    params = init_params(jax.random.key(0), CFG, jnp.float32)
    stock_path = str(tmp_path / "stock.rajni")
    export_model(stock_path, params, CFG, None, batch=2,
                 dtype=jnp.float32, platform="cpu")
    stock = load_exported(stock_path)

    engines = {
        "pruned": BatchingEngine(pruned, max_delay_ms=2.0),
        "stock": BatchingEngine(stock, max_delay_ms=2.0),
    }
    httpd = make_server(engines, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/v1/models")
        assert json.loads(conn.getresponse().read()) == {
            "models": ["pruned", "stock"]
        }

        crop = rng.integers(0, 256, (16, 16, 3), np.uint8)
        outs = {}
        for path in ("/v1/classify",  # default = first registry entry
                     "/v1/models/pruned/classify",
                     "/v1/models/stock/classify"):
            conn.request("POST", path, body=crop.tobytes(),
                         headers={"Content-Type":
                                  "application/octet-stream"})
            outs[path] = json.loads(conn.getresponse().read())["top_logits"]
        assert outs["/v1/classify"] == outs["/v1/models/pruned/classify"]
        # same weights, different schedule -> different logits
        assert outs["/v1/models/stock/classify"] != outs["/v1/classify"]

        conn.request("POST", "/v1/models/nope/classify", body=b"")
        assert conn.getresponse().status == 404

        conn.request("GET", "/v1/models/stock/stats")
        assert json.loads(conn.getresponse().read())["requests"] == 1
        conn.request("GET", "/v1/stats")  # multi-model: per-name map
        agg = json.loads(conn.getresponse().read())
        assert agg["pruned"]["requests"] == 2 and agg["stock"]["requests"] == 1
    finally:
        httpd.shutdown()
        httpd.server_close()
        for e in engines.values():
            e.stop()


def test_http_server_roundtrip(tmp_path, rng):
    serve = _artifact(tmp_path, batch=2)
    eng = BatchingEngine(serve, max_delay_ms=2.0)
    httpd = make_server(eng, port=0)  # OS-assigned port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)

        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read()) == {"ok": True}

        # raw uint8 crop
        crop = rng.integers(0, 256, (16, 16, 3), np.uint8)
        conn.request("POST", "/v1/classify", body=crop.tobytes(),
                     headers={"Content-Type": "application/octet-stream"})
        out = json.loads(conn.getresponse().read())
        assert len(out["top_classes"]) == 5 and out["latency_ms"] > 0
        want = np.argsort(eng.classify(crop))[::-1][:5].tolist()
        assert out["top_classes"] == want

        # encoded image: decoded + center-cropped host-side
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 256, (24, 20, 3), np.uint8)
        ).save(buf, format="PNG")
        conn.request("POST", "/v1/classify", body=buf.getvalue(),
                     headers={"Content-Type": "image/png"})
        out = json.loads(conn.getresponse().read())
        assert len(out["top_classes"]) == 5

        # malformed raw body -> 400, not a dead server
        conn.request("POST", "/v1/classify", body=b"abc",
                     headers={"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        assert resp.status == 400 and "error" in json.loads(resp.read())

        conn.request("GET", "/v1/stats")
        snap = json.loads(conn.getresponse().read())
        assert snap["requests"] >= 3 and snap["p50_ms"] > 0
    finally:
        httpd.shutdown()
        httpd.server_close()
        eng.stop()
