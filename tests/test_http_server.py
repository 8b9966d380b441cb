"""HTTP detection service smoke test (reference Flask demo counterpart,
utils/flask_rest_api/restapi.py:16-37): POST /v1/detect with base64 JPEGs
returns Detections.pandas-style records — served here on a rect canvas."""

import base64
import http.client
import json
import threading
from http.server import HTTPServer

import jax
import numpy as np
import pytest

from icafusion_tpu.models import build_model
from icafusion_tpu.models.zoo import tiny_icafusion_config


@pytest.fixture(scope="module")
def server():
    from icafusion_tpu.data import native
    if not native.available():
        pytest.skip("native library not built (predict_paths needs it)")
    from icafusion_tpu.serve import http_server
    from icafusion_tpu.serve.engine import ServingEngine

    cfg = tiny_icafusion_config(nc=3)
    model = build_model(cfg)
    x = np.zeros((1, 64, 96, 3), np.float32)
    variables = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": jax.random.PRNGKey(0)}, x, x, train=False, decode=False)
    http_server.ENGINE = ServingEngine(model=model, variables=variables,
                                       img_size=(64, 96), batch_size=1,
                                       conf_thres=0.001)
    http_server.NAMES = ["person", "car", "bike"]
    srv = HTTPServer(("127.0.0.1", 0), http_server.Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()


def _post(port, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_detect_roundtrip(server, tmp_path):
    import cv2
    img = np.random.default_rng(0).integers(0, 255, (120, 160, 3), np.uint8)
    p = tmp_path / "in.jpg"
    cv2.imwrite(str(p), img)
    b64 = base64.b64encode(p.read_bytes()).decode()

    status, data = _post(server, "/v1/detect", {"rgb": b64, "ir": b64})
    assert status == 200
    records = json.loads(data)
    assert isinstance(records, list)
    for r in records:  # reference Detections.pandas() field set
        assert set(r) == {"xmin", "ymin", "xmax", "ymax", "confidence",
                          "class", "name"}
        assert r["name"] in ("person", "car", "bike")
        # native-frame coords (120x160 source), not the 64x96 canvas
        assert 0 <= r["xmin"] <= r["xmax"] <= 160 + 1e-3
        assert 0 <= r["ymin"] <= r["ymax"] <= 120 + 1e-3


def test_bad_request_is_400(server):
    status, data = _post(server, "/v1/detect", {"rgb": "not base64!!"})
    assert status == 400
    assert "error" in json.loads(data)


def test_unknown_path_is_404(server):
    status, _ = _post(server, "/nope", {})
    assert status == 404


@pytest.fixture(scope="module")
def batched_server():
    """Threaded server with the micro-batcher in front (the production
    configuration of serve/http_server.py main): decode in request threads,
    concurrent requests coalesced into bucketed device batches."""
    from http.server import ThreadingHTTPServer

    from icafusion_tpu.serve import http_server
    from icafusion_tpu.serve.batcher import MicroBatcher
    from icafusion_tpu.serve.engine import ServingEngine

    cfg = tiny_icafusion_config(nc=3)
    model = build_model(cfg)
    x = np.zeros((1, 64, 96, 3), np.float32)
    variables = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": jax.random.PRNGKey(1)}, x, x, train=False, decode=False)
    engine = ServingEngine(model=model, variables=variables,
                           img_size=(64, 96), batch_size=4, n_devices=1,
                           conf_thres=0.001)
    old_engine, old_batcher = http_server.ENGINE, http_server.BATCHER
    http_server.ENGINE = engine
    http_server.BATCHER = MicroBatcher(engine, max_wait_ms=200.0)
    http_server.NAMES = ["person", "car", "bike"]
    srv = ThreadingHTTPServer(("127.0.0.1", 0), http_server.Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()
    http_server.BATCHER.close()
    http_server.ENGINE, http_server.BATCHER = old_engine, old_batcher


def test_batched_concurrent_detects_and_stats(batched_server, tmp_path):
    import cv2
    from concurrent.futures import ThreadPoolExecutor
    img = np.random.default_rng(7).integers(0, 255, (120, 160, 3), np.uint8)
    p = tmp_path / "in.jpg"
    cv2.imwrite(str(p), img)
    b64 = base64.b64encode(p.read_bytes()).decode()

    with ThreadPoolExecutor(6) as ex:
        results = list(ex.map(
            lambda _: _post(batched_server, "/v1/detect",
                            {"rgb": b64, "ir": b64}), range(6)))
    for status, data in results:
        assert status == 200
        for r in json.loads(data):
            assert set(r) == {"xmin", "ymin", "xmax", "ymax", "confidence",
                              "class", "name"}
            # native-frame coords (120x160 source), not the 64x96 canvas
            assert 0 <= r["xmin"] <= r["xmax"] <= 160 + 1e-3
            assert 0 <= r["ymin"] <= r["ymax"] <= 120 + 1e-3
    # identical request -> same detections regardless of which bucket each
    # landed in (tolerance: bucket shapes may differ in float association)
    first = json.loads(results[0][1])
    for _, data in results[1:]:
        recs = json.loads(data)
        assert len(recs) == len(first)
        for a, b in zip(recs, first):
            assert a["class"] == b["class"]
            for k in ("xmin", "ymin", "xmax", "ymax", "confidence"):
                assert abs(a[k] - b[k]) < 1e-3

    conn = http.client.HTTPConnection("127.0.0.1", batched_server, timeout=60)
    conn.request("GET", "/v1/stats")
    resp = conn.getresponse()
    stats = json.loads(resp.read())
    conn.close()
    assert resp.status == 200
    assert stats["requests"] == 6
    assert stats["batches"] >= 1
