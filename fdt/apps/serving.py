"""Micro-batching inference serving for the detector zoo.

The reference's only online path is a per-frame webcam loop (Video.py:106-129,
FACEBOX/Video.py:56-78, MTCNN/Video.py:53-74): one image per forward, no
concurrency story.  On TPU, single-image dispatch wastes the MXU — throughput
comes from batch parallelism (bench.py: the flagship detector at batch 64 runs
~6x the images/s of batch 1).  This module is the production-serving layer the
reference never had:

  MicroBatcher       background worker coalescing concurrent requests into
                     batches (first request opens a window of `max_wait_ms`;
                     everything that arrives before it closes — up to
                     `max_batch` — rides the same device dispatch), resolving
                     per-request futures and propagating per-batch errors.
  DetectionService   family adapters (pyramidbox / facebox / mtcnn) that
                     resize requests to the service frame size on host, pad
                     the batch to a power-of-two bucket (a bounded set of
                     compiled executables — no per-size retraces), run the
                     batched jitted detect, and map boxes back to each
                     request's original pixel coordinates.
  serve_http         stdlib ThreadingHTTPServer front-end: POST /detect with
                     encoded image bytes -> JSON detection rows; GET /healthz
                     with service + batching stats.  Every handler thread
                     funnels into the one MicroBatcher, so HTTP concurrency
                     becomes device batch size.
"""
from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Sequence

import numpy as np

_SENTINEL = object()


class MicroBatcher:
    """Coalesce concurrent `submit` calls into list-batched `batch_fn` calls.

    batch_fn(items: list) -> sequence of per-item results (same length/order).
    A batch_fn exception fails every future of that batch; the worker keeps
    serving subsequent batches.
    """

    def __init__(self, batch_fn: Callable[[list], Sequence],
                 max_batch: int = 32, max_wait_ms: float = 5.0):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self._batch_fn = batch_fn
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._closed = False
        self.requests = 0
        self.batches = 0
        # running aggregates, not a per-batch list: a long-running server
        # would otherwise leak one entry per batch and pay O(n) per /healthz
        self._size_sum = 0
        self._size_max = 0
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="fdt-microbatcher")
        self._worker.start()

    def submit(self, item) -> Future:
        """Enqueue one request; returns a Future resolving to its result."""
        fut: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self.requests += 1
            self._q.put((fut, item))
        return fut

    def close(self, timeout: float = 30.0) -> None:
        """Stop accepting requests, drain in-flight ones, join the worker.

        If the worker doesn't finish within `timeout` (e.g. stuck in a long
        cold-bucket compile), still-queued futures are failed instead of left
        pending forever — a caller blocked in fut.result() must get an error,
        not a hang, when the daemon worker dies with the process."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
        self._q.put(_SENTINEL)
        self._worker.join(timeout)
        if self._worker.is_alive():
            while True:
                try:
                    item = self._q.get_nowait()
                except queue.Empty:
                    break
                if item is not _SENTINEL and not item[0].done():
                    item[0].set_exception(
                        RuntimeError("MicroBatcher closed before this "
                                     "request was served"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def stats(self) -> dict:
        n = self.batches
        return {"requests": self.requests, "batches": n,
                "max_batch_size": self._size_max,
                "mean_batch_size": (self._size_sum / n) if n else 0.0}

    def _run(self) -> None:
        while True:
            first = self._q.get()
            if first is _SENTINEL:
                return
            batch = [first]
            stop = False
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    item = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if item is _SENTINEL:
                    stop = True
                    break
                batch.append(item)
            # Claim every future before running: set_running_or_notify_cancel
            # locks out fut.cancel(), so a client-cancelled future can't make
            # set_result raise InvalidStateError mid-loop (which would poison
            # the OTHER requests of the batch with a spurious error).
            live = [(f, it) for f, it in batch
                    if f.set_running_or_notify_cancel()]
            futures = [f for f, _ in live]
            if futures:
                try:
                    results = self._batch_fn([it for _, it in live])
                    if len(results) != len(futures):
                        raise RuntimeError(
                            f"batch_fn returned {len(results)} results for "
                            f"{len(futures)} items")
                    for fut, res in zip(futures, results):
                        fut.set_result(res)
                except Exception as e:  # noqa: BLE001 — relay to the callers
                    for fut in futures:
                        if not fut.done():
                            fut.set_exception(e)
            self.batches += 1
            self._size_sum += len(futures)
            self._size_max = max(self._size_max, len(futures))
            if stop:
                return


def _bucket(n: int, max_batch: int) -> int:
    """Next power-of-two >= n, capped at max_batch (bounded jit cache)."""
    return min(max_batch, 1 << max(n - 1, 0).bit_length())


class DetectionService:
    """Batched detection serving over one detector family.

    family: "pyramidbox" | "facebox" | "mtcnn"; `detector` is the matching
    fdt.infer detector instance.  Requests are BGR uint8 images of ANY
    resolution; results are [N, 5] float32 rows [x1, y1, x2, y2, score] in the
    REQUEST's pixel coordinates (empty [0, 5] when nothing detected — serving
    drops the eval protocol's [[0,0,0,0,0.4]] bookkeeping sentinel,
    My_test.py:61-62).  For mtcnn the rows carry landmarks too: [N, 15] =
    box+score then 10 landmark coords, like MtcnnDetector.detect_face.
    """

    def __init__(self, family: str, detector, frame_size=(640, 480),
                 threshold: float = 0.4, nms_thresh: float = 0.35,
                 max_batch: int = 32, max_wait_ms: float = 5.0):
        if family not in ("pyramidbox", "facebox", "mtcnn"):
            raise ValueError(f"unknown family: {family!r}")
        self.family = family
        self.detector = detector
        if family == "facebox":  # fixed square input (FACEBOX/My_test_facebox.py:20)
            s = detector.cfg.input_size
            frame_size = (s, s)
        self.frame_w, self.frame_h = frame_size
        self.threshold = threshold
        self.nms_thresh = nms_thresh
        # serializes _run_batch between the batcher worker and warmup():
        # the detectors' LRU jit caches are not safe under concurrent mutation
        self._infer_lock = threading.Lock()
        self.batcher = MicroBatcher(self._run_batch, max_batch=max_batch,
                                    max_wait_ms=max_wait_ms)

    # -- public API --------------------------------------------------------

    def submit(self, image_bgr: np.ndarray) -> Future:
        if image_bgr.ndim != 3 or image_bgr.shape[2] != 3:
            raise ValueError(f"expected HxWx3 BGR image, got {image_bgr.shape}")
        return self.batcher.submit(np.asarray(image_bgr, np.uint8))

    def detect(self, image_bgr: np.ndarray) -> np.ndarray:
        """Blocking single-request detect (rides a shared batch)."""
        return self.submit(image_bgr).result()

    def warmup(self) -> None:
        """Compile every bucket executable up front (cold-start latency)."""
        n = 1
        while True:
            frame = np.zeros((self.frame_h, self.frame_w, 3), np.uint8)
            self._run_batch([frame] * n)
            if n >= self.batcher.max_batch:
                return
            n = _bucket(n + 1, self.batcher.max_batch)

    def stats(self) -> dict:
        return {"family": self.family,
                "frame_size": [self.frame_w, self.frame_h],
                "threshold": self.threshold, **self.batcher.stats()}

    def close(self) -> None:
        self.batcher.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- batch path ----------------------------------------------------------

    def _run_batch(self, images: list[np.ndarray]) -> list[np.ndarray]:
        import cv2
        n = len(images)
        sizes = [(im.shape[1], im.shape[0]) for im in images]  # (w, h)
        frames = np.stack(
            [im if im.shape[:2] == (self.frame_h, self.frame_w)
             else cv2.resize(im, (self.frame_w, self.frame_h))
             for im in images])
        pad = _bucket(n, self.batcher.max_batch) - n
        if pad:
            frames = np.concatenate([frames, np.repeat(frames[-1:], pad, 0)])
        with self._infer_lock:
            rows = getattr(self, f"_rows_{self.family}")(frames)
        return [rows[i](*sizes[i]) for i in range(n)]

    def _rows_pyramidbox(self, frames):
        det = self.detector.detect_tensor(frames, conf_thresh=self.threshold,
                                          nms_thresh=self.nms_thresh)

        def make(i):
            def to_rows(w, h):
                from fdt.infer.pyramidbox import detections_to_rows
                r = detections_to_rows(det[i], self.threshold, [w, h, w, h])
                if r.shape == (1, 5) and not r[0, :4].any():  # empty sentinel
                    return np.empty((0, 5), np.float32)
                return r.astype(np.float32)
            return to_rows

        return [make(i) for i in range(len(det))]

    def _rows_facebox(self, frames):
        results = self.detector.detect_batch(frames)

        def make(boxes, scores):
            def to_rows(w, h):
                if not len(scores):
                    return np.empty((0, 5), np.float32)
                keep = scores >= self.threshold
                px = boxes[keep] * np.array([w, h, w, h], np.float32)
                return np.column_stack([px, scores[keep]]).astype(np.float32)
            return to_rows

        return [make(b, s) for b, s in results]

    def _rows_mtcnn(self, frames):
        boxes, lms, counts, _sat = self.detector.detect_batch(frames)

        def make(i):
            def to_rows(w, h):
                c = int(counts[i])
                if not c:
                    return np.empty((0, 15), np.float32)
                sx = w / self.frame_w
                sy = h / self.frame_h
                b = boxes[i, :c].copy()
                b[:, [0, 2]] *= sx
                b[:, [1, 3]] *= sy
                lm = lms[i, :c].copy()
                lm[:, 0::2] *= sx
                lm[:, 1::2] *= sy
                keep = b[:, 4] >= self.threshold
                return np.column_stack([b[keep], lm[keep]]).astype(np.float32)
            return to_rows

        return [make(i) for i in range(len(counts))]


# -- HTTP front-end -----------------------------------------------------------


def make_http_server(service: DetectionService, host: str = "127.0.0.1",
                     port: int = 0, max_body_bytes: int = 64 << 20):
    """Build (don't start) a ThreadingHTTPServer around a DetectionService.

    POST /detect    body = encoded image (jpg/png/...; anything cv2.imdecode
                    reads) -> {"detections": [[x1,y1,x2,y2,score,...], ...]}.
                    Optional ?threshold=T post-filters rows by score.
                    Bodies over `max_body_bytes` (64 MB default) are rejected
                    with 413 before buffering — a client-declared
                    Content-Length must not be able to OOM the server.
    GET  /healthz   -> {"status": "ok", ...service stats}.

    The caller owns the lifecycle: server.serve_forever() (usually on a
    thread), then server.shutdown(); service.close().
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — http.server API
            if self.path.split("?")[0] == "/healthz":
                self._reply(200, {"status": "ok", **service.stats()})
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            import urllib.parse
            url = urllib.parse.urlparse(self.path)
            if url.path != "/detect":
                self._reply(404, {"error": f"unknown path {url.path}"})
                return
            try:
                import cv2
                length = int(self.headers.get("Content-Length", 0))
                if length > max_body_bytes:
                    self._reply(413, {"error": f"body {length} bytes exceeds "
                                               f"limit {max_body_bytes}"})
                    return
                raw = self.rfile.read(length)
                img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                                   cv2.IMREAD_COLOR)
                if img is None:
                    self._reply(400, {"error": "undecodable image payload"})
                    return
                rows = service.detect(img)
                q = urllib.parse.parse_qs(url.query)
                if "threshold" in q:
                    rows = rows[rows[:, 4] >= float(q["threshold"][0])]
                self._reply(200, {"detections": rows.tolist(),
                                  "count": int(len(rows))})
            except Exception as e:  # noqa: BLE001 — HTTP boundary
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *args):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve_http(service: DetectionService, host: str = "127.0.0.1",
               port: int = 8000) -> None:  # pragma: no cover — CLI loop
    server = make_http_server(service, host, port)
    print(f"fdt serving {service.family} on http://{host}:{server.server_address[1]}"
          f" (frame {service.frame_w}x{service.frame_h}, "
          f"max_batch {service.batcher.max_batch})", flush=True)
    try:
        server.serve_forever()
    finally:
        server.shutdown()
        service.close()
