"""REST inference server (stdlib http.server — no framework dependency).

Functional parity surface: reference ``utils/flask_rest_api/restapi.py:16-29``
— a POST endpoint taking an image and returning detections as JSON records.
Extended for two streams: POST /v1/detect with multipart or JSON-base64
fields ``rgb`` and ``ir``.

Production path (``BatchingService``): concurrent requests are micro-batched
— a dispatcher thread collects up to ``max_batch`` requests (or ``max_wait_ms``)
and runs ONE fixed-shape jit call (padded, so there is exactly one XLA
program), under a data-axis device mesh when more than one accelerator is
attached (params replicated, batch sharded — the deploy forward has zero
cross-device collectives, so throughput scales with the mesh)."""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
from http.server import (BaseHTTPRequestHandler, HTTPServer,
                         ThreadingHTTPServer)

import jax
import jax.numpy as jnp
import numpy as np

from mmidet_tpu.data.datasets import letterbox_np
from mmidet_tpu.ops.nms import non_max_suppression


def _preprocess(img_bytes: bytes, s: int):
    """decode -> letterbox; returns (lb_uint8, ratio, (dw, dh), orig)."""
    from PIL import Image
    img0 = np.asarray(Image.open(io.BytesIO(img_bytes)).convert("RGB"))
    lb, r, (dw, dh) = letterbox_np(img0, (s, s))
    return lb, r, (dw, dh)


def _records(dets: np.ndarray, valid: np.ndarray, r: float, dw: float,
             dh: float, names) -> list[dict]:
    out = []
    for x1, y1, x2, y2, conf, cls in dets[valid]:
        out.append({
            "xmin": float((x1 - dw) / r), "ymin": float((y1 - dh) / r),
            "xmax": float((x2 - dw) / r), "ymax": float((y2 - dh) / r),
            "confidence": float(conf),
            "class": int(cls),
            "name": names[int(cls)],
        })
    return out


class DetectionService:
    """Holds the jitted model + pre/postprocessing."""

    def __init__(self, model, variables, names, img_size: int = 640,
                 conf_thres: float = 0.25, iou_thres: float = 0.45):
        self.model = model
        self.variables = variables
        self.names = names
        self.img_size = img_size

        @jax.jit
        def infer(variables, rgb, ir):
            out = model.apply(variables, rgb, ir, train=False)
            return non_max_suppression(out["pred"].astype(jnp.float32),
                                       conf_thres=conf_thres,
                                       iou_thres=iou_thres)
        self._infer = lambda rgb, ir: infer(self.variables, rgb, ir)
        # warm the jit at construction so the first request doesn't pay the
        # compile (the reference's flask server has the same cold-start,
        # restapi.py loads the model at import)
        z = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
        jax.block_until_ready(self._infer(z, z))

    def predict(self, rgb_bytes: bytes, ir_bytes: bytes) -> list[dict]:
        s = self.img_size
        lb_r, r, (dw, dh) = _preprocess(rgb_bytes, s)
        lb_i, _, _ = _preprocess(ir_bytes, s)
        dets, valid = self._infer(
            jnp.asarray(lb_r, jnp.float32)[None] / 255.0,
            jnp.asarray(lb_i, jnp.float32)[None] / 255.0)
        return _records(np.asarray(dets)[0], np.asarray(valid)[0], r, dw,
                        dh, self.names)


class BatchingService:
    """Micro-batching front-end: requests from concurrent connections are
    collected (up to ``max_batch`` or ``max_wait_ms``) and served by ONE
    fixed-shape jit call.  Short batches are zero-padded — a single XLA
    program serves every load level.  With >1 device and ``max_batch``
    divisible by the device count, the batch is sharded over a data-axis
    mesh and params are replicated (linear multi-chip serving throughput;
    see tests/test_train_step.py::test_dp8_inference_matches_single)."""

    def __init__(self, model, variables, names, img_size: int = 640,
                 conf_thres: float = 0.25, iou_thres: float = 0.45,
                 max_batch: int = 8, max_wait_ms: float = 5.0,
                 devices=None):
        self.model = model
        self.names = names
        self.img_size = img_size
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3

        def infer(variables, rgb, ir):
            out = model.apply(variables, rgb, ir, train=False)
            return non_max_suppression(out["pred"].astype(jnp.float32),
                                       conf_thres=conf_thres,
                                       iou_thres=iou_thres)

        devices = jax.devices() if devices is None else devices
        self._bsh = None
        if len(devices) > 1 and max_batch % len(devices) == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from mmidet_tpu.parallel.mesh import batch_sharding, make_mesh
            mesh = make_mesh(n_data=len(devices), n_model=1,
                             devices=devices)
            self._bsh = batch_sharding(mesh)
            variables = jax.device_put(variables,
                                       NamedSharding(mesh, P()))
        self.variables = variables
        self._jit = jax.jit(infer)
        self._q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._dispatch, daemon=True)
        self._thread.start()
        # warm the one program (full max_batch shape)
        z = np.zeros((max_batch, img_size, img_size, 3), np.float32)
        jax.block_until_ready(self._run(z, z))

    def _run(self, rgb: np.ndarray, ir: np.ndarray):
        r = jnp.asarray(rgb)
        i = jnp.asarray(ir)
        if self._bsh is not None:
            r = jax.device_put(r, self._bsh)
            i = jax.device_put(i, self._bsh)
        return self._jit(self.variables, r, i)

    def _dispatch(self):
        import time
        while True:
            first = self._q.get()
            if first is None:
                return
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    item = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if item is None:
                    return
                batch.append(item)
            n = len(batch)
            s = self.img_size
            rgb = np.zeros((self.max_batch, s, s, 3), np.float32)
            ir = np.zeros_like(rgb)
            for k, (lb_r, lb_i, _meta, _fut) in enumerate(batch):
                rgb[k] = lb_r
                ir[k] = lb_i
            try:
                dets, valid = self._run(rgb, ir)
                dets = np.asarray(dets)
                valid = np.asarray(valid)
                for k, (_r, _i, meta, fut) in enumerate(batch):
                    fut["result"] = (dets[k], valid[k])
                    fut["event"].set()
            except Exception as e:  # surface to every waiter
                for _r, _i, _m, fut in batch:
                    fut["error"] = e
                    fut["event"].set()

    def predict(self, rgb_bytes: bytes, ir_bytes: bytes) -> list[dict]:
        s = self.img_size
        lb_r, r, (dw, dh) = _preprocess(rgb_bytes, s)
        lb_i, _, _ = _preprocess(ir_bytes, s)
        fut = {"event": threading.Event()}
        self._q.put((lb_r.astype(np.float32) / 255.0,
                     lb_i.astype(np.float32) / 255.0, (r, dw, dh), fut))
        fut["event"].wait()
        if "error" in fut:
            raise fut["error"]
        dets, valid = fut["result"]
        return _records(dets, valid, r, dw, dh, self.names)

    def close(self):
        self._q.put(None)


def _parse_multipart(body: bytes, content_type: str) -> dict[str, bytes]:
    """Minimal multipart/form-data parser: {field name: raw bytes}.
    (stdlib cgi is removed in py3.13; email.parser handles the framing)."""
    import email.parser
    import email.policy
    msg = email.parser.BytesParser(policy=email.policy.default).parsebytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body)
    parts = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name:
            parts[str(name)] = part.get_payload(decode=True)
    return parts


def make_handler(service: DetectionService):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path.rstrip("/") not in ("/v1/detect", "/v1/object-detection"):
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            try:
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("multipart/form-data"):
                    # the reference protocol (restapi.py:16-29 posts an
                    # image file field); fields: 'image' (or 'rgb') + 'ir'
                    parts = _parse_multipart(body, ctype)
                    rgb = parts.get("image") or parts.get("rgb")
                    if rgb is None:
                        raise ValueError(
                            "multipart needs an 'image' or 'rgb' part")
                    ir = parts.get("ir", rgb)
                else:
                    payload = json.loads(body)
                    rgb = base64.b64decode(payload["rgb"])
                    ir = base64.b64decode(payload.get("ir", payload["rgb"]))
                records = service.predict(rgb, ir)
                out = json.dumps(records).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
            except Exception as e:
                self.send_error(400, str(e))

        def log_message(self, *a):  # quiet
            pass
    return Handler


def serve(service, host: str = "0.0.0.0", port: int = 5000,
          threaded: bool = True):
    """``threaded=True`` (default) uses ThreadingHTTPServer so concurrent
    connections overlap — required for BatchingService to actually batch."""
    cls = ThreadingHTTPServer if threaded else HTTPServer
    srv = cls((host, port), make_handler(service))
    print(f"serving on http://{host}:{port}/v1/detect")
    srv.serve_forever()


def _calibrate_int8(model, variables, rgb_dir: str, ir_dir: str,
                    img_size: int, max_images: int = 4, clip: float = 1.0):
    """Startup calibration for the s8-storage quantized serving mode:
    letterbox up to ``max_images`` pairs from the calib dirs and hand them
    to ``nn.quant.make_quant_deploy``.  Calibration images should match
    the serving distribution (per-tensor absmax scales)."""
    import os

    from PIL import Image

    if not rgb_dir or not ir_dir:
        raise SystemExit("--int8 requires --calib-rgb and --calib-ir "
                         "(a few representative paired images)")
    from mmidet_tpu.nn.quant import make_quant_deploy

    def _load(d):
        fs = sorted(os.path.join(d, f) for f in os.listdir(d)
                    if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
        assert fs, f"no images in {d}"
        out = []
        for f in fs[:max_images]:
            lb, _, _ = letterbox_np(np.asarray(Image.open(f).convert("RGB")),
                                    (img_size, img_size))
            out.append(lb.astype(np.float32) / 255.0)
        return jnp.asarray(np.stack(out))

    rgb, ir = _load(rgb_dir), _load(ir_dir)
    n = min(rgb.shape[0], ir.shape[0])
    return make_quant_deploy(model, variables, [(rgb[:n], ir[:n])],
                             clip=clip)


def main(argv=None):
    """Serve CLI: ``python -m mmidet_tpu.deploy.serve --cfg yolov5l_fourier
    --weights runs/exp/ckpt/deploy --names People Car ...``"""
    import argparse

    p = argparse.ArgumentParser("mmidet-tpu serve")
    p.add_argument("--cfg", type=str, default="yolov5s_add")
    p.add_argument("--weights", type=str, default="",
                   help="orbax deploy dir or converted torch .pt")
    p.add_argument("--names", type=str, nargs="*", default=None)
    p.add_argument("--nc", type=int, default=6)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--max-batch", type=int, default=8,
                   help="micro-batch size (one fixed-shape XLA program); "
                        "sharded over all attached devices when divisible")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="max time to hold a request while batching")
    p.add_argument("--no-batching", action="store_true",
                   help="single-request mode (the reference's behavior)")
    p.add_argument("--int8", action="store_true",
                   help="s8-storage quantized deploy (activations cross "
                        "HBM as int8; requires --calib-rgb/--calib-ir)")
    p.add_argument("--calib-rgb", type=str, default="",
                   help="dir of RGB images for --int8 scale calibration")
    p.add_argument("--calib-ir", type=str, default="",
                   help="dir of IR images paired with --calib-rgb")
    p.add_argument("--int8-clip", type=float, default=1.0,
                   help="calibration absmax clip for --int8 (0.9 measured "
                        "best on a converged model, PERF.md round 4)")
    args = p.parse_args(argv)

    from mmidet_tpu.cli.val import load_model_and_vars
    model, variables, spec = load_model_and_vars(
        args.cfg, args.weights, nc=args.nc)
    if args.int8:
        model, variables = _calibrate_int8(
            model, variables, args.calib_rgb, args.calib_ir, args.img_size,
            clip=args.int8_clip)
    names = args.names or [str(i) for i in range(args.nc)]
    if args.no_batching:
        service = DetectionService(model, variables, names,
                                   img_size=args.img_size,
                                   conf_thres=args.conf_thres,
                                   iou_thres=args.iou_thres)
    else:
        service = BatchingService(model, variables, names,
                                  img_size=args.img_size,
                                  conf_thres=args.conf_thres,
                                  iou_thres=args.iou_thres,
                                  max_batch=args.max_batch,
                                  max_wait_ms=args.max_wait_ms)
    serve(service, args.host, args.port)


if __name__ == "__main__":
    main()
