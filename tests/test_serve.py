"""REST serving endpoint end-to-end on a tiny model (reference
utils/flask_rest_api/restapi.py parity surface)."""

import base64
import io
import json
import threading
import urllib.error
import urllib.request
from http.server import HTTPServer

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def server():
    from PIL import Image  # noqa: F401  (decode dependency)
    from mmidet_tpu.cli.val import load_model_and_vars
    from mmidet_tpu.deploy.serve import DetectionService, make_handler

    model, variables, _ = load_model_and_vars("yolov5s_add", "", nc=2,
                                              use_cem=False)
    svc = DetectionService(model, variables, ["a", "b"], img_size=32,
                           conf_thres=1e-4)
    srv = HTTPServer(("127.0.0.1", 0), make_handler(svc))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _b64(img):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_detect_endpoint(server):
    rng = np.random.default_rng(0)
    img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    req = urllib.request.Request(
        server + "/v1/detect",
        data=json.dumps({"rgb": _b64(img), "ir": _b64(255 - img)}).encode(),
        headers={"Content-Type": "application/json"})
    resp = urllib.request.urlopen(req, timeout=300)
    recs = json.loads(resp.read())
    assert resp.status == 200
    assert isinstance(recs, list)
    if recs:
        assert {"xmin", "ymin", "xmax", "ymax", "confidence", "class",
                "name"} <= set(recs[0])


def test_detect_endpoint_multipart(server):
    """The reference protocol is a multipart file upload
    (restapi.py:16-29) — the endpoint must accept it too."""
    from PIL import Image
    rng = np.random.default_rng(1)
    img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    png = buf.getvalue()
    boundary = "xBOUNDx"
    body = b""
    for name in ("image", "ir"):
        body += (f"--{boundary}\r\nContent-Disposition: form-data; "
                 f'name="{name}"; filename="{name}.png"\r\n'
                 "Content-Type: image/png\r\n\r\n").encode() + png + b"\r\n"
    body += f"--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        server + "/v1/object-detection", data=body,
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    resp = urllib.request.urlopen(req, timeout=300)
    assert resp.status == 200
    assert isinstance(json.loads(resp.read()), list)


def test_bad_payload_and_path(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(urllib.request.Request(
            server + "/v1/detect", data=b"not-json"), timeout=60)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(urllib.request.Request(
            server + "/nope", data=b"{}"), timeout=60)
    assert e.value.code == 404


@pytest.fixture(scope="module")
def batch_server():
    """BatchingService over the ThreadingHTTPServer: micro-batched,
    dp-sharded over the 8-device virtual CPU mesh (max_batch=8 -> 1
    image per device)."""
    from http.server import ThreadingHTTPServer
    from mmidet_tpu.cli.val import load_model_and_vars
    from mmidet_tpu.deploy.serve import BatchingService, make_handler

    model, variables, _ = load_model_and_vars("yolov5s_add", "", nc=2,
                                              use_cem=False)
    svc = BatchingService(model, variables, ["a", "b"], img_size=32,
                          conf_thres=1e-4, max_batch=8, max_wait_ms=30.0)
    assert svc._bsh is not None  # the 8-dev mesh engaged
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", svc
    srv.shutdown()
    svc.close()


def test_batched_concurrent_requests(batch_server):
    """N concurrent posts are served in one micro-batch with per-request
    results identical to the single-request service."""
    url, svc = batch_server
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (40, 48, 3), np.uint8) for _ in range(6)]

    results = [None] * len(imgs)

    def post(k):
        payload = json.dumps({"rgb": _b64(imgs[k])}).encode()
        req = urllib.request.Request(
            url + "/v1/detect", data=payload,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            results[k] = json.loads(resp.read())

    threads = [threading.Thread(target=post, args=(k,))
               for k in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None for r in results)

    # per-request results match a direct (unbatched-path) predict
    import io as _io
    from PIL import Image

    def raw(img):
        buf = _io.BytesIO()
        Image.fromarray(img).save(buf, "PNG")
        return buf.getvalue()

    for k, img in enumerate(imgs):
        direct = svc.predict(raw(img), raw(img))
        assert len(direct) == len(results[k])
        if direct:
            np.testing.assert_allclose(
                [d["confidence"] for d in direct],
                [r["confidence"] for r in results[k]], rtol=1e-4)


def test_int8_serving(tmp_path):
    """--int8 serving: startup calibration from paired image dirs
    (serve._calibrate_int8) -> quantized DetectionService end-to-end."""
    from PIL import Image
    from mmidet_tpu.cli.val import load_model_and_vars
    from mmidet_tpu.deploy.serve import DetectionService, _calibrate_int8

    rng = np.random.default_rng(3)
    rdir, idir = tmp_path / "rgb", tmp_path / "ir"
    rdir.mkdir(); idir.mkdir()
    for k in range(2):
        img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(rdir / f"{k}.png")
        Image.fromarray(255 - img).save(idir / f"{k}.png")

    model, variables, _ = load_model_and_vars("yolov5s_add", "", nc=2,
                                              use_cem=False)
    q_model, q_vars = _calibrate_int8(model, variables, str(rdir),
                                      str(idir), img_size=32)
    assert "quant" in q_vars
    svc = DetectionService(q_model, q_vars, ["a", "b"], img_size=32,
                           conf_thres=1e-4)
    img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    recs = svc.predict(buf.getvalue(), buf.getvalue())
    assert isinstance(recs, list)


def test_int8_serving_requires_calib_dirs():
    from mmidet_tpu.deploy.serve import _calibrate_int8
    with pytest.raises(SystemExit):
        _calibrate_int8(None, None, "", "", 32)


def test_serve_bench_smoke(monkeypatch, capsys):
    """tools/serve_bench.py end-to-end on CPU (--cpu-ok): both operating
    points produce well-formed records through the REAL HTTP+batching
    stack (the official numbers come from the chip; this pins the
    harness)."""
    monkeypatch.syspath_prepend(str(__import__("pathlib").Path(__file__)
                                    .resolve().parent.parent))
    from tools.serve_bench import main

    main(["--cfg", "yolov5s_add", "--img", "32", "--nc", "2",
          "--concurrency", "3", "--requests", "6", "--max-batch", "2",
          "--latency-requests", "6", "--cpu-ok", "--no-stage"])
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert len(lines) == 2
    lat, thr = (json.loads(ln) for ln in lines)
    assert lat["metric"].endswith("_c1_latency") and lat["value"] > 0
    assert thr["metric"].endswith("_c3_throughput") and thr["value"] > 0
    assert thr["n"] == 6 and thr["p99_ms"] >= thr["p50_ms"]
