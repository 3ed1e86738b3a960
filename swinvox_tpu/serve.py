"""Micro-batching inference server: concurrent requests -> one TPU queue.

The reference has no serving path at all (predictions only flow through
its offline eval loop, core/test.py); this is the deployment layer a
production user needs on TPU, where throughput comes from large static
batches and a single in-flight compiled program:

    from swinvox_tpu.infer import Predictor
    from swinvox_tpu.serve import BatchingServer

    server = BatchingServer(Predictor.from_checkpoint(...), batch_size=32)
    fut = server.submit(images)          # [N, H, W, 3], returns a Future
    vol = fut.result()                   # [32, 32, 32] probabilities
    server.close()

Design, TPU-first:
  * ONE static shape [batch_size, n_views, H, W, 3] — a single compiled
    executable, no recompiles, MXU-sized batches.  Requests with fewer /
    more views than `n_views` are cyclically tiled / truncated (the
    reference's eval likewise slices the first N views,
    core/test.py:112-118).
  * micro-batching: the dispatcher thread coalesces whatever is queued
    (up to `batch_size`, waiting at most `max_wait_ms` after the first
    request) into one padded device batch, so tail latency is bounded
    while bulk traffic rides full batches.  All requests share one
    static H/W (pinned by the first request — one compiled program).

`python -m swinvox_tpu.serve --checkpoint ckpt [--port 8000]` exposes the
same path over stdlib HTTP (POST /predict with a raw float32 npy body).
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)


class ServerOverloadedError(RuntimeError):
    """Raised by submit() when the bounded request queue is full.

    Backpressure policy: the queue never grows past ``max_queue``; the
    caller sheds load instead (the HTTP layer maps this to 503)."""


class _Request:
    __slots__ = ("images", "future", "t_submit")

    def __init__(self, images: np.ndarray):
        self.images = images
        self.future: Future = Future()
        self.t_submit = time.perf_counter()


def _fit_views(images: np.ndarray, n_views: int) -> np.ndarray:
    """[N, H, W, 3] -> [n_views, H, W, 3] by cyclic tiling / truncation."""
    n = images.shape[0]
    if n == n_views:
        return images
    idx = np.arange(n_views) % n
    return images[idx]


class BatchingServer:
    """Coalesces concurrent predict() calls into fixed-shape device batches.

    Parameters
    ----------
    predictor: swinvox_tpu.infer.Predictor (or anything with a
        ``predict(images: [B,N,H,W,3]) -> [B,D,H,W]`` method).
    batch_size: static device batch (requests are padded up to it).
    n_views: static view count; requests are tiled/truncated to it.
        Defaults to the predictor config's CONST.N_VIEWS_RENDERING.
    max_wait_ms: max time the dispatcher waits after the first queued
        request before launching a partial batch.
    max_queue: bound on queued requests; submit() raises
        ServerOverloadedError when full (backpressure, never unbounded).
    timeout_ms: optional per-request deadline; requests that sat in the
        queue longer are failed with TimeoutError instead of being run.
    """

    def __init__(
        self,
        predictor,
        batch_size: int = 32,
        n_views: Optional[int] = None,
        max_wait_ms: float = 5.0,
        max_queue: int = 1024,
        timeout_ms: Optional[float] = None,
    ):
        self.predictor = predictor
        self.batch_size = int(batch_size)
        cfg = getattr(predictor, "cfg", None)
        self.n_views = int(
            n_views
            if n_views is not None
            else (cfg.CONST.N_VIEWS_RENDERING if cfg is not None else 1)
        )
        self.max_wait = max_wait_ms / 1000.0
        self.timeout = timeout_ms / 1000.0 if timeout_ms is not None else None
        self._queue: "queue.Queue[_Request]" = queue.Queue(maxsize=max_queue)
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._hw = None  # static image H/W, pinned by the first request
        self._stats = {
            "requests": 0,
            "batches": 0,
            "batch_occupancy_sum": 0,
            "latency_sum_s": 0.0,
            "rejected_overload": 0,
            "timed_out": 0,
        }
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="swinvox-serve", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------- client
    def submit(self, images: np.ndarray) -> Future:
        """images: [N, H, W, 3] float32 (already eval-transformed).

        Returns a Future resolving to the [D, H, W] probability volume.
        """
        images = np.asarray(images, dtype=np.float32)
        if images.ndim != 4 or images.shape[-1] != 3 or images.shape[0] < 1:
            raise ValueError(
                f"expected [n_views >= 1, H, W, 3], got {images.shape}"
            )
        req = _Request(_fit_views(images, self.n_views))
        # The stop-check, H/W pin and enqueue happen under ONE lock, and
        # close() sets _stop under the same lock before its final drain:
        # a request can therefore never land in a dead queue (a Future
        # that would otherwise hang its client forever).
        with self._lock:
            if self._stop.is_set():
                raise RuntimeError("server is closed")
            # all requests in a server share one static H/W (one compiled
            # program); pin it from the first request and reject
            # mismatches here, in the CLIENT thread — a bad shape must
            # never reach the dispatcher
            if self._hw is None:
                self._hw = images.shape[1:3]
            elif images.shape[1:3] != self._hw:
                raise ValueError(
                    f"image H/W {images.shape[1:3]} != server's {self._hw} "
                    "(fixed by the first request)"
                )
            try:
                self._queue.put_nowait(req)
            except queue.Full:
                self._stats["rejected_overload"] += 1
                raise ServerOverloadedError(
                    f"request queue full ({self._queue.maxsize}); retry later"
                ) from None
        return req.future

    def predict(self, images: np.ndarray) -> np.ndarray:
        """Blocking convenience wrapper around submit()."""
        return self.submit(images).result()

    def stats(self) -> dict:
        with self._lock:
            s = dict(self._stats)
        if s["batches"]:
            s["mean_batch_occupancy"] = s["batch_occupancy_sum"] / s["batches"]
        if s["requests"]:
            s["mean_latency_ms"] = 1000.0 * s["latency_sum_s"] / s["requests"]
        return s

    def close(self) -> None:
        with self._lock:  # pairs with submit(): no put after _stop is set
            self._stop.set()
        self._thread.join(timeout=30)
        # fail whatever is still queued (the dispatcher drains the queue
        # before exiting, so this only fires if the join timed out)
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            req.future.set_exception(RuntimeError("server closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # --------------------------------------------------------- dispatcher
    def _take_batch(self) -> list:
        """Block for the first request, then coalesce up to batch_size."""
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        reqs = [first]
        deadline = time.perf_counter() + self.max_wait
        while len(reqs) < self.batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0 and self._queue.empty():
                break
            try:
                reqs.append(self._queue.get(timeout=max(remaining, 0.0)))
            except queue.Empty:
                break
        return reqs

    def _expire(self, reqs: list) -> list:
        """Fail requests that outlived timeout_ms while queued."""
        if self.timeout is None:
            return reqs
        now = time.perf_counter()
        live = []
        for r in reqs:
            age = now - r.t_submit
            if age > self.timeout:
                with self._lock:
                    self._stats["timed_out"] += 1
                r.future.set_exception(
                    TimeoutError(
                        f"request queued {1000 * age:.0f} ms > "
                        f"timeout {1000 * self.timeout:.0f} ms"
                    )
                )
            else:
                live.append(r)
        return live

    def _dispatch_loop(self) -> None:
        while not self._stop.is_set() or not self._queue.empty():
            reqs = self._expire(self._take_batch())
            if not reqs:
                continue
            # submit() pins H/W, so assembly cannot shape-mismatch; wrap
            # the whole batch anyway — an exception escaping this loop
            # would kill the dispatcher and hang every future forever
            try:
                batch = np.zeros(
                    (self.batch_size, self.n_views)
                    + reqs[0].images.shape[1:],
                    dtype=np.float32,
                )
                for i, r in enumerate(reqs):
                    batch[i] = r.images
                result = self.predictor.predict(batch)
            except Exception as e:  # surface compile/runtime errors
                for r in reqs:
                    r.future.set_exception(e)
                continue
            self._finalize(reqs, result)

    def _finalize(self, reqs: list, result) -> None:
        out = np.asarray(result)
        now = time.perf_counter()
        with self._lock:
            self._stats["requests"] += len(reqs)
            self._stats["batches"] += 1
            self._stats["batch_occupancy_sum"] += len(reqs)
            self._stats["latency_sum_s"] += sum(
                now - r.t_submit for r in reqs
            )
        for i, r in enumerate(reqs):
            r.future.set_result(out[i])


# ------------------------------------------------------------------ HTTP

class MultiServer:
    """Routes requests across several named BatchingServers (one model /
    checkpoint each) sharing one process and one device.

    The reference serves a single model from its notebook; production
    deployment wants N checkpoints (e.g. per-category fine-tunes or
    A/B candidates) behind one endpoint.  Each model keeps its own
    micro-batching queue and stats; the device naturally serializes the
    dispatchers.  ``default`` names the model used when a request does
    not specify one (first registered model otherwise).
    """

    def __init__(self, servers, default: Optional[str] = None):
        if not servers:
            raise ValueError("MultiServer needs at least one model")
        self._servers = dict(servers)
        self.default = default if default is not None else next(iter(servers))
        if self.default not in self._servers:
            raise KeyError(self.default)

    def __getitem__(self, name: str) -> BatchingServer:
        return self._servers[name]

    @property
    def models(self):
        return tuple(self._servers)

    def _pick(self, model: Optional[str]) -> BatchingServer:
        name = model if model is not None else self.default
        try:
            return self._servers[name]
        except KeyError:
            raise KeyError(
                f"unknown model {name!r}; available: {sorted(self._servers)}"
            ) from None

    def submit(self, images: np.ndarray, model: Optional[str] = None):
        return self._pick(model).submit(images)

    def predict(
        self, images: np.ndarray, model: Optional[str] = None
    ) -> np.ndarray:
        return self._pick(model).predict(images)

    def stats(self) -> dict:
        return {name: srv.stats() for name, srv in self._servers.items()}

    def close(self) -> None:
        for srv in self._servers.values():
            srv.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _make_http_server(server, port: int):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    multi = isinstance(server, MultiServer)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.path == "/stats":
                body = json.dumps(server.stats()).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/models" and multi:
                body = json.dumps(
                    {"models": list(server.models),
                     "default": server.default}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):  # noqa: N802
            # /predict (default model) or /predict/<model> (multi-model)
            model = None
            if self.path.startswith("/predict/"):
                model = self.path[len("/predict/"):]
            elif self.path != "/predict":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                images = np.load(
                    io.BytesIO(self.rfile.read(length)), allow_pickle=False
                )
                if multi:
                    vol = server.predict(images, model=model)
                elif model is None:
                    vol = server.predict(images)
                else:
                    self.send_error(404, "single-model server")
                    return
            except KeyError as e:
                self.send_error(404, str(e))
                return
            except ServerOverloadedError as e:
                self.send_error(503, str(e))  # shed load, client retries
                return
            except TimeoutError as e:
                self.send_error(504, str(e))
                return
            except Exception as e:
                self.send_error(400, str(e))
                return
            buf = io.BytesIO()
            np.save(buf, vol)
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.end_headers()
            self.wfile.write(buf.getvalue())

        def log_message(self, fmt, *args):
            log.info("http: " + fmt, *args)

    return ThreadingHTTPServer(("0.0.0.0", port), Handler)


def main(argv: Optional[Sequence[str]] = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--checkpoint", required=True, action="append",
        help="checkpoint path, or NAME=PATH (repeatable for multi-model "
             "serving; the first one is the default model)",
    )
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--n-views", type=int, default=None)
    parser.add_argument("--max-wait-ms", type=float, default=5.0)
    parser.add_argument("--max-queue", type=int, default=1024)
    parser.add_argument("--timeout-ms", type=float, default=None)
    args = parser.parse_args(argv)

    from swinvox_tpu.infer import Predictor

    logging.basicConfig(level=logging.INFO)

    def build(path):
        return BatchingServer(
            Predictor.from_checkpoint(path),
            batch_size=args.batch_size,
            n_views=args.n_views,
            max_wait_ms=args.max_wait_ms,
            max_queue=args.max_queue,
            timeout_ms=args.timeout_ms,
        )

    specs = [
        c.split("=", 1) if "=" in c else [None, c] for c in args.checkpoint
    ]
    if len(specs) == 1 and specs[0][0] is None:
        server_cm = build(specs[0][1])
    else:
        servers = {}
        for i, (name, path) in enumerate(specs):
            servers[name if name is not None else f"model{i}"] = build(path)
        server_cm = MultiServer(servers)
    with server_cm as server:
        httpd = _make_http_server(server, args.port)
        log.info(
            "serving on :%d (POST /predict[/model], GET /stats)", args.port
        )
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
