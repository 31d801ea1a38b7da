"""Localization serving (pipeline/serve.py): service-level query bucketing
and the HTTP surface, against a map built by the device tracker."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from fastmatch_tpu.core.camera import Pinhole
from fastmatch_tpu.pipeline.config import BAConfig, MapConfig, PipelineConfig
from fastmatch_tpu.pipeline.localize import build_map_index
from fastmatch_tpu.pipeline.serve import LocalizeService, make_server
from fastmatch_tpu.pipeline.slam import SlamConfig
from fastmatch_tpu.pipeline.slam_device import slam_device
from test_localize import _pose_err
from test_slam import CircleScene, features_of


@pytest.fixture(scope="module")
def service():
    from synth import random_descriptors

    rng = np.random.default_rng(0)
    scene = CircleScene(rng, n_points=300, n_frames=26)
    base_desc = random_descriptors(rng, 300)
    feats = features_of(rng, scene, base_desc=base_desc)
    cfg = PipelineConfig(
        ba=BAConfig(interval=5, max_iters=8, pcg_iters=30),
        map=MapConfig(max_frames=32, max_points=4096, max_obs=32768),
    )
    scfg = SlamConfig(window=6, loop_gap=10, loop_min_votes=20)
    out = slam_device(feats, Pinhole.from_K(scene.K), cfg, scfg)
    qfeats = features_of(np.random.default_rng(99), scene,
                         base_desc=base_desc)
    index = build_map_index(out.rec.points, out.rec.pt_desc,
                            out.rec.pt_mask)
    svc = LocalizeService(index, Pinhole.from_K(scene.K))
    return svc, out.rec, qfeats


def test_service_query_buckets(service):
    """Different keypoint counts land in shared power-of-two buckets —
    and queries localize against the map's own poses."""
    svc, rec, qfeats = service
    for f, trim in ((5, 0), (13, 7), (21, 130)):
        xy, d, m = qfeats[f]
        n = xy.shape[0] - trim
        out = svc.query(xy[:n], d[:n], m[:n])
        assert out["ok"], out
        dc, ang = _pose_err(rec, f, np.array(out["R"]), np.array(out["t"]))
        assert dc < 0.15 and ang < 2.0, (f, dc, ang)
    assert svc.queries == 3


def test_http_server_roundtrip(service):
    svc, rec, qfeats = service
    httpd = make_server(svc, port=0)
    port = httpd.server_port
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["index"] == "exact"
        assert health["map_points"] > 100

        xy, d, m = qfeats[8]
        buf = io.BytesIO()
        np.savez(buf, xy=xy, desc=d, mask=m)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/localize", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["ok"], out
        dc, ang = _pose_err(rec, 8, np.array(out["R"]), np.array(out["t"]))
        assert dc < 0.15 and ang < 2.0, (dc, ang)
        assert out["ms"] > 0

        # center is consistent with R/t
        c = -np.array(out["R"]).T @ np.array(out["t"])
        np.testing.assert_allclose(np.array(out["center"]), c, atol=1e-9)

        # malformed request -> 400 with an error payload, server survives
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/localize", data=b"not an npz",
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["queries_served"] >= 1
    finally:
        httpd.shutdown()
        httpd.server_close()
