"""REST inference server (stdlib http.server — no framework dependency).

Functional parity surface: reference ``utils/flask_rest_api/restapi.py:16-29``
— a POST endpoint taking an image and returning detections as JSON records.
Extended for two streams: POST /v1/detect with multipart or JSON-base64
fields ``rgb`` and ``ir``."""

from __future__ import annotations

import base64
import io
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from mmidet_tpu.data.datasets import letterbox_np
from mmidet_tpu.ops.nms import non_max_suppression


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
        from PIL import Image
        rgb0 = np.asarray(Image.open(io.BytesIO(rgb_bytes)).convert("RGB"))
        ir0 = np.asarray(Image.open(io.BytesIO(ir_bytes)).convert("RGB"))
        s = self.img_size
        lb_r, r, (dw, dh) = letterbox_np(rgb0, (s, s))
        lb_i, _, _ = letterbox_np(ir0, (s, s))
        dets, valid = self._infer(
            jnp.asarray(lb_r, jnp.float32)[None] / 255.0,
            jnp.asarray(lb_i, jnp.float32)[None] / 255.0)
        d = np.asarray(dets)[0][np.asarray(valid)[0]]
        records = []
        for x1, y1, x2, y2, conf, cls in d:
            records.append({
                "xmin": float((x1 - dw) / r), "ymin": float((y1 - dh) / r),
                "xmax": float((x2 - dw) / r), "ymax": float((y2 - dh) / r),
                "confidence": float(conf),
                "class": int(cls),
                "name": self.names[int(cls)],
            })
        return records


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


def serve(service: DetectionService, host: str = "0.0.0.0",
          port: int = 5000):
    srv = HTTPServer((host, port), make_handler(service))
    print(f"serving on http://{host}:{port}/v1/detect")
    srv.serve_forever()


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
    args = p.parse_args(argv)

    from mmidet_tpu.cli.val import load_model_and_vars
    model, variables, spec = load_model_and_vars(
        args.cfg, args.weights, nc=args.nc)
    names = args.names or [str(i) for i in range(args.nc)]
    service = DetectionService(model, variables, names,
                               img_size=args.img_size,
                               conf_thres=args.conf_thres,
                               iou_thres=args.iou_thres)
    serve(service, args.host, args.port)


if __name__ == "__main__":
    main()
