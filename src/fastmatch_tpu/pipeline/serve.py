"""Localization serving: a long-running query service over a prebuilt map.

Production deployment of the localization product (pipeline/localize.py)
is query-shaped: the map is built offline (slam/reconstruct --checkpoint),
then MANY clients ask "where is this frame?" with tight latency bounds.
This module owns the serving concerns the one-shot `locate` CLI does not:

- **One compile, many queries.** Queries are padded to a fixed
  power-of-two capacity bucket, so every request after the warmup hits
  the jit cache; the map index (and its IVF structure, above the measured
  ~100k-row crossover) is built exactly once at startup.
- **Warmup before the socket opens**: the first TPU compile is seconds —
  taking it on a live request would blow any latency SLO, so serve()
  drives one synthetic query through the full path before binding.
- **Transport**: stdlib ThreadingHTTPServer. POST /localize with an npz
  body (arrays ``xy`` (C, 2), ``desc`` (C, 128), optional ``mask``);
  responds JSON {ok, R, t, center, n_matches, n_inliers, ms}. GET
  /healthz reports map size / index kind / queries served. JAX dispatch
  is serialized with a lock (one TPU; requests queue fairly).

CLI: ``fastmatch-tpu serve <map_ckpt> --port 8080``.

No reference counterpart (a 2013 research matching repo has no serving
story) — north-star production completeness.
"""

from __future__ import annotations

import io
import json
import threading
import time

import numpy as np

from fastmatch_tpu.pipeline.localize import MapIndex, localize


def _bucket(n: int, floor: int = 256) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


class LocalizeService:
    """Pad-to-bucket wrapper around localize(): stable shapes -> one
    compile per bucket; thread-safe (a lock serializes device work)."""

    def __init__(self, index: MapIndex, camera, thr_px: float = 2.0,
                 ratio: float = 0.8, budget: int = 8192,
                 min_inliers: int = 12, seed: int = 0):
        self.index = index
        self.camera = camera
        self.thr_px = thr_px
        self.ratio = ratio
        self.budget = budget
        self.min_inliers = min_inliers
        self.seed = seed
        self.queries = 0
        self._lock = threading.Lock()

    def query(self, xy, desc, mask=None) -> dict:
        xy = np.asarray(xy, np.float32)
        desc = np.asarray(desc, np.float32)
        n = xy.shape[0]
        if mask is None:
            mask = np.ones(n, bool)
        mask = np.asarray(mask, bool)
        cap = _bucket(n)
        pxy = np.zeros((cap, 2), np.float32)
        pd = np.zeros((cap, 128), np.float32)
        pm = np.zeros(cap, bool)
        pxy[:n], pd[:n], pm[:n] = xy, desc, mask
        t0 = time.perf_counter()
        with self._lock:
            r = localize(self.index, pxy, pd, pm, self.camera,
                         thr_px=self.thr_px, ratio=self.ratio,
                         budget=self.budget, min_inliers=self.min_inliers,
                         seed=self.seed)
            R = np.asarray(r.R, np.float64)
            t = np.asarray(r.t, np.float64)
            ok = bool(r.ok)
            nm, ni = int(r.n_matches), int(r.n_inliers)
            self.queries += 1
        center = (-R.T @ t).tolist()
        return {
            "ok": ok,
            "R": R.tolist(), "t": t.tolist(), "center": center,
            "n_matches": nm, "n_inliers": ni,
            "ms": round(1e3 * (time.perf_counter() - t0), 2),
        }

    def warmup(self, cap: int = 1024) -> None:
        """Compile the query path before serving (synthetic descriptors;
        the result is discarded)."""
        rng = np.random.default_rng(0)
        d = np.abs(rng.standard_normal((cap, 128))).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-9
        xy = rng.uniform(0, 2 * float(self.camera.cx),
                         (cap, 2)).astype(np.float32)
        self.query(xy, d)
        self.queries = 0

    def health(self) -> dict:
        return {
            "status": "ok",
            "map_points": int(np.asarray(self.index.bank.mask).sum()),
            "bank_capacity": int(self.index.bank.capacity),
            "index": "ivf" if self.index.ivf is not None else "exact",
            "queries_served": self.queries,
        }


def make_server(service: LocalizeService, host: str = "127.0.0.1",
                port: int = 0):
    """Build (not start) the HTTP server; returns it with .server_port
    bound (port=0 picks a free one — tests use this)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, service.health())
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/localize":
                self._reply(404, {"error": f"no route {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                data = np.load(io.BytesIO(self.rfile.read(n)),
                               allow_pickle=False)
                if "xy" not in data or "desc" not in data:
                    raise KeyError("need arrays 'xy' and 'desc'")
                out = service.query(data["xy"], data["desc"],
                                    data["mask"] if "mask" in data else None)
                self._reply(200, out)
            except Exception as e:  # noqa: BLE001 — serving boundary
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):  # quiet; metrics live in /healthz
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve(map_ckpt: str, camera, host: str = "127.0.0.1", port: int = 8080,
          ann_threshold: int | None = None, thr_px: float = 2.0,
          warmup_cap: int = 1024, ready_event: threading.Event = None):
    """Load the map, warm the compile cache, and serve until interrupted."""
    from fastmatch_tpu.pipeline.localize import map_index_from_checkpoint

    index = map_index_from_checkpoint(map_ckpt, ann_threshold=ann_threshold)
    service = LocalizeService(index, camera, thr_px=thr_px)
    service.warmup(warmup_cap)
    httpd = make_server(service, host, port)
    if ready_event is not None:
        ready_event.set()
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return service
