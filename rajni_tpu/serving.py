"""Production serving: dynamic request batching over an exported artifact.

The reference has no serving layer (SURVEY.md §1 — inference-only research
CLI); this module is the TPU-native production surface on top of
:mod:`rajni_tpu.export`. A single accelerator reaches its throughput only on
large batches (the fused kernels are routed by batch size), but online
traffic arrives one request at a time — the classic tension dynamic batching
resolves:

* :class:`BatchingEngine` — a request queue + one device worker thread.
  Callers :meth:`~BatchingEngine.submit` single images and get a
  ``concurrent.futures.Future`` of their logits row; the worker coalesces
  whatever is queued within ``max_delay_ms`` of the oldest request (up to
  ``max_batch``) into ONE device call. Latency is bounded by the delay
  budget, throughput approaches the offered-load batch size.
* :func:`make_server` / the ``python -m rajni_tpu.serving`` CLI — a stdlib
  threaded HTTP front-end: ``POST /v1/classify`` with an image body, each
  connection thread blocks on its future, so concurrent connections batch
  onto the chip automatically. ``GET /v1/stats`` exposes live throughput
  and latency percentiles.

The engine understands all three artifact flavors from
:func:`rajni_tpu.export.export_model`: multi-bucket artifacts batch up to
the largest bucket (the artifact pads/chunks internally), batch-polymorphic
artifacts run every coalesced batch unpadded, and fixed-batch artifacts are
padded/chunked here. It also accepts any plain ``images -> logits``
callable (e.g. a jitted ``vit_forward``) for in-process serving.

Typical latency/throughput trade: ``max_delay_ms=0`` degenerates to
per-request calls (minimum latency, minimum throughput); a few ms of delay
budget buys near-peak throughput under load because the queue fills while
the previous batch occupies the device.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future

import numpy as np

__all__ = ["BatchingEngine", "ServingStats", "make_server", "main"]


class ServingStats:
    """Thread-safe rolling serving metrics (lock-protected counters plus a
    bounded window of per-request latencies for the percentile estimates)."""

    def __init__(self, window: int = 4096):
        from collections import deque

        self._lock = threading.Lock()
        self._lat_ms = deque(maxlen=window)
        self._batch_sizes = deque(maxlen=window)
        self._requests = 0
        self._batches = 0
        self._t0 = time.perf_counter()

    def record_batch(self, size: int, latencies_ms: list) -> None:
        with self._lock:
            self._requests += size
            self._batches += 1
            self._batch_sizes.append(size)
            self._lat_ms.extend(latencies_ms)

    def snapshot(self) -> dict:
        """Current metrics: request/batch counts, mean coalesced batch size,
        wall-clock request throughput, and p50/p99 request latency (ms)."""
        with self._lock:
            lat = np.asarray(self._lat_ms, np.float64)
            sizes = np.asarray(self._batch_sizes, np.float64)
            elapsed = max(time.perf_counter() - self._t0, 1e-9)
            return {
                "requests": self._requests,
                "batches": self._batches,
                "mean_batch": float(sizes.mean()) if sizes.size else 0.0,
                "throughput_req_s": self._requests / elapsed,
                "p50_ms": float(np.percentile(lat, 50)) if lat.size else 0.0,
                "p99_ms": float(np.percentile(lat, 99)) if lat.size else 0.0,
            }


class _Request:
    __slots__ = ("image", "future", "t_submit")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.future: Future = Future()
        self.t_submit = time.perf_counter()


class BatchingEngine:
    """Coalesce concurrent single-image requests into device batches.

    Parameters
    ----------
    serve_fn:
        ``images -> logits`` — a :func:`rajni_tpu.export.load_exported`
        callable (its ``buckets`` / ``dynamic_batch`` / ``input_spec``
        attributes drive padding policy) or any plain callable accepting
        arbitrary leading batch sizes.
    max_batch:
        Cap on one coalesced device call. Defaults to the artifact's
        natural capacity: largest bucket, or the fixed baked batch, or 256
        for batch-polymorphic/plain callables.
    max_delay_ms:
        How long the worker may hold the OLDEST queued request while more
        arrive. The p99 latency floor is roughly this plus one device call.
    normalize:
        When True (default) requests are uint8 ``[H, W, 3]`` center crops
        (:func:`rajni_tpu.data.pipeline.preprocess_u8`) and the engine
        ImageNet-normalizes on device (uint8 H2D — 4× less transfer);
        when False requests are pre-normalized arrays of the model dtype.
    """

    def __init__(
        self,
        serve_fn,
        max_batch: int | None = None,
        max_delay_ms: float = 5.0,
        normalize: bool = True,
        autostart: bool = True,
    ):
        self._serve = serve_fn
        self._normalize = normalize
        spec = getattr(serve_fn, "input_spec", None)
        buckets = getattr(serve_fn, "buckets", None)
        dynamic = getattr(serve_fn, "dynamic_batch", True)
        #: per-image input shape/dtype the requests must match (None for a
        #: plain callable — then the first request defines the batch shape)
        self.image_shape = tuple(spec.shape[1:]) if spec is not None else None
        self._in_dtype = spec.dtype if spec is not None else None
        # fixed-batch artifacts are the only flavor the ENGINE must pad for:
        # buckets pad internally, dynamic/plain callables accept any batch
        self._fixed = (
            int(spec.shape[0])
            if spec is not None and buckets is None and not dynamic
            else None
        )
        if max_batch is None:
            if buckets:
                max_batch = int(buckets[-1])
            elif self._fixed is not None:
                max_batch = self._fixed
            else:
                max_batch = 256
        self.max_batch = int(max_batch)
        self.max_delay_s = float(max_delay_ms) / 1e3
        self.stats = ServingStats()
        self._q: queue.Queue[_Request] = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._worker, name="rajni-batcher", daemon=True
        )
        if autostart:
            self.start()

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> None:
        if not self._thread.is_alive():
            self._thread.start()

    def stop(self) -> None:
        """Drain the queue, finish in-flight batches, and join the worker."""
        self._stop.set()
        if self._thread.is_alive():
            self._thread.join()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    def warmup(self) -> None:
        """Pre-compile every device program the engine can dispatch (one
        zeros batch per bucket / the fixed batch / ``max_batch`` for
        polymorphic callables) so the first real request pays serving
        latency, not jit-compile latency. Stats are not polluted."""
        shape = self.image_shape or (224, 224, 3)
        import jax.numpy as jnp

        dtype = self._in_dtype if self._in_dtype is not None else jnp.float32
        sizes = (
            [int(b) for b in getattr(self._serve, "buckets", None) or []]
            or [self._fixed or self.max_batch]
        )
        for b in sizes:
            np.asarray(self._call(jnp.zeros((b,) + tuple(shape), dtype)))

    # -- request path ------------------------------------------------------
    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one image; returns a Future of its ``[num_classes]``
        logits row (numpy float32). Raises immediately on a shape/dtype
        mismatch with the artifact's input spec."""
        image = np.asarray(image)
        if self.image_shape is not None and tuple(image.shape) != self.image_shape:
            raise ValueError(
                f"request shape {image.shape} != artifact input "
                f"{self.image_shape}"
            )
        if self._normalize and image.dtype != np.uint8:
            raise ValueError(
                f"normalize=True engines take uint8 crops, got {image.dtype}"
            )
        req = _Request(image)
        self._q.put(req)
        return req.future

    def classify(self, image: np.ndarray) -> np.ndarray:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(image).result()

    # -- worker ------------------------------------------------------------
    def _worker(self) -> None:
        while not self._stop.is_set() or not self._q.empty():
            try:
                first = self._q.get(timeout=0.02)
            except queue.Empty:
                continue
            batch = [first]
            deadline = first.t_submit + self.max_delay_s
            while len(batch) < self.max_batch:
                wait = deadline - time.perf_counter()
                if wait <= 0 and self._q.empty():
                    break
                try:
                    batch.append(self._q.get(timeout=max(wait, 0.0)))
                except queue.Empty:
                    break
            self._run_batch(batch)

    def _run_batch(self, batch: list) -> None:
        try:
            import jax.numpy as jnp

            x = jnp.asarray(np.stack([r.image for r in batch]))
            if self._normalize:
                from .data.device import normalize_images

                x = normalize_images(
                    x, self._in_dtype if self._in_dtype is not None else x.dtype
                )
            elif self._in_dtype is not None:
                x = x.astype(self._in_dtype)
            logits = np.asarray(self._call(x), np.float32)
        except Exception as e:  # noqa: BLE001 — failures go to the futures
            for r in batch:
                if not r.future.cancelled():
                    r.future.set_exception(e)
            return
        done = time.perf_counter()
        lat_ms = [(done - r.t_submit) * 1e3 for r in batch]
        for r, row in zip(batch, logits):
            if not r.future.cancelled():
                r.future.set_result(row)
        self.stats.record_batch(len(batch), lat_ms)

    def _call(self, x):
        """One device call; pad/chunk only for fixed-batch artifacts (the
        bucket/dynamic flavors handle arbitrary leading sizes themselves)."""
        import jax.numpy as jnp

        if self._fixed is None:
            return self._serve(x)
        outs = []
        for i in range(0, x.shape[0], self._fixed):
            chunk = x[i : i + self._fixed]
            c = chunk.shape[0]
            if c < self._fixed:
                pad = jnp.zeros(
                    (self._fixed - c,) + tuple(chunk.shape[1:]), chunk.dtype
                )
                chunk = jnp.concatenate([chunk, pad])
            outs.append(self._serve(chunk)[:c])
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


# -- HTTP front-end --------------------------------------------------------

def make_server(engine, host: str = "127.0.0.1",
                port: int = 8000, top_k: int = 5):
    """Build (without starting) a ``ThreadingHTTPServer`` over one
    :class:`BatchingEngine` or a ``{name: engine}`` registry (multi-model:
    e.g. a stock, a pruned, and an int8 tier sharing one chip — the
    engines' device calls interleave naturally).

    Endpoints (``<m>`` = a registry name; omit the ``/models/<m>`` segment
    to hit the default model — the single engine, or the registry's first):

    * ``POST /v1/classify`` | ``/v1/models/<m>/classify`` — body is an
      encoded image (``Content-Type: image/*``; decoded + center-cropped
      host-side like the eval pipeline) or a raw uint8 ``[H, W, 3]`` crop
      (``application/octet-stream`` with the model's exact byte count).
      Response: ``{"top_classes": [...], "top_logits": [...],
      "latency_ms": x}``.
    * ``GET /healthz`` — liveness; ``GET /v1/models`` — registry names.
    * ``GET /v1/stats`` | ``/v1/models/<m>/stats`` —
      :meth:`ServingStats.snapshot` (the bare form returns a
      ``{name: snapshot}`` map when serving multiple models).

    Each connection thread blocks on its request's future, so concurrent
    clients coalesce into shared device batches — the server IS the load
    aggregator, no sidecar needed.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    engines = (
        dict(engine) if isinstance(engine, dict) else {"default": engine}
    )
    if not engines:
        raise ValueError("make_server needs at least one engine")
    default = next(iter(engines))
    multi = isinstance(engine, dict) and len(engines) > 1

    def resolve(path: str, leaf: str):
        """``/v1/<leaf>`` → default engine; ``/v1/models/<m>/<leaf>`` →
        registry lookup. Returns the engine or None."""
        if path == f"/v1/{leaf}":
            return engines[default]
        prefix, suffix = "/v1/models/", f"/{leaf}"
        if path.startswith(prefix) and path.endswith(suffix):
            return engines.get(path[len(prefix):-len(suffix)])
        return None

    class Handler(BaseHTTPRequestHandler):
        # engines shared across every connection; stats per engine
        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — http.server API
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            elif self.path == "/v1/models":
                self._json(200, {"models": list(engines)})
            elif self.path == "/v1/stats" and multi:
                self._json(200, {
                    n: e.stats.snapshot() for n, e in engines.items()
                })
            elif (eng := resolve(self.path, "stats")) is not None:
                self._json(200, eng.stats.snapshot())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802 — http.server API
            eng = resolve(self.path, "classify")
            if eng is None:
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            t0 = time.perf_counter()
            try:
                crop = self._decode(eng, body, ctype)
                row = eng.submit(crop).result()
            except Exception as e:  # noqa: BLE001 — report to the client
                self._json(400, {"error": str(e)})
                return
            order = np.argsort(row)[::-1][:top_k]
            self._json(200, {
                "top_classes": [int(i) for i in order],
                "top_logits": [float(row[i]) for i in order],
                "latency_ms": (time.perf_counter() - t0) * 1e3,
            })

        def _decode(self, eng, body: bytes, ctype: str) -> np.ndarray:
            shape = eng.image_shape or (224, 224, 3)
            if ctype.startswith("application/octet-stream"):
                n = int(np.prod(shape))
                if len(body) != n:
                    raise ValueError(
                        f"raw body must be {n} bytes for uint8 {shape}, "
                        f"got {len(body)}"
                    )
                return np.frombuffer(body, np.uint8).reshape(shape)
            import io

            from PIL import Image

            from .data.pipeline import preprocess_u8

            with Image.open(io.BytesIO(body)) as im:
                return preprocess_u8(im.convert("RGB"), shape[0])

        def log_message(self, *args):  # quiet per-request stderr lines
            pass

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> None:
    """CLI: ``python -m rajni_tpu.serving model.rajni --port 8000``.

    Several artifacts serve as a multi-model registry from one process
    (``a.rajni b.rajni --names stock,pruned`` →
    ``POST /v1/models/pruned/classify``; the first is also the default
    model at ``/v1/classify``).
    """
    import argparse
    import os

    p = argparse.ArgumentParser("rajni-tpu dynamic-batching model server")
    p.add_argument("artifacts", nargs="+", metavar="artifact",
                   help=".rajni export(s) (rajni_tpu.export); several "
                        "serve as a multi-model registry")
    p.add_argument("--names", default=None,
                   help="comma list naming each artifact in request paths "
                        "(default: the file stems)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_delay_ms", type=float, default=5.0,
                   help="batching window measured from the oldest "
                        "queued request")
    p.add_argument("--max_batch", type=int, default=None,
                   help="cap one device call (default: the artifact's "
                        "largest bucket / fixed batch)")
    p.add_argument("--top_k", type=int, default=5)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip pre-compiling the device programs at startup "
                        "(first requests then pay jit-compile latency)")
    args = p.parse_args(argv)

    from .export import load_exported

    names = (
        args.names.split(",") if args.names
        else [os.path.splitext(os.path.basename(a))[0]
              for a in args.artifacts]
    )
    if len(names) != len(args.artifacts) or len(set(names)) != len(names):
        raise ValueError(
            f"--names needs {len(args.artifacts)} distinct entries, "
            f"got {names}"
        )
    engines: dict[str, BatchingEngine] = {}
    for name, path in zip(names, args.artifacts):
        serve_fn = load_exported(path)
        engines[name] = eng = BatchingEngine(
            serve_fn, max_batch=args.max_batch,
            max_delay_ms=args.max_delay_ms,
        )
        if not args.no_warmup:
            t0 = time.perf_counter()
            eng.warmup()
            print(f"warmup[{name}]: device programs compiled in "
                  f"{time.perf_counter() - t0:.1f}s")
        flavor = (
            f"buckets {serve_fn.buckets}" if serve_fn.buckets
            else "dynamic batch" if serve_fn.dynamic_batch
            else f"fixed batch {serve_fn.input_spec.shape[0]}"
        )
        print(f"model {name!r}: {path} ({flavor}, "
              f"max_batch={eng.max_batch})")
    httpd = make_server(
        engines if len(engines) > 1 else engines[names[0]],
        args.host, args.port, args.top_k,
    )
    print(f"serving {len(engines)} model(s) on "
          f"http://{args.host}:{httpd.server_address[1]} "
          f"[delay={args.max_delay_ms}ms]")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        for eng in engines.values():
            eng.stop()


if __name__ == "__main__":
    main()
