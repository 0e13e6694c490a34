"""Serving-path benchmark: the PRODUCTION REST surface, measured end-to-end.

What it measures (deploy/serve.py BatchingService behind ThreadingHTTPServer,
the same stack ``python -m mmidet_tpu.deploy.serve`` runs): JPEG bytes ->
HTTP POST (JSON base64, reference protocol shape per
utils/flask_rest_api/restapi.py) -> PIL decode + letterbox -> micro-batched
single-XLA-program forward + fixed-shape NMS -> JSON records, round-tripped
over localhost.  This is the number a deployment engineer actually sees —
chip-only img/s (bench.py) excludes decode/HTTP/batching.

Two closed-loop operating points, each staged to BENCH_partial.json:

  * concurrency 1  -> interactive latency  (serve_<cfg>_<img>_c1: p50/p99 ms)
  * concurrency C  -> sustained throughput (serve_<cfg>_<img>_cC: req/s, p99)

Usage: python tools/serve_bench.py [--cfg yolov5s_gpt4] [--img 640]
         [--concurrency 32] [--requests 200] [--max-batch 16] [--cpu-ok]

``--cpu-ok`` permits a non-TPU device (harness smoke test); official records
must come from the real chip (device kind is carried in the record).
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import pathlib
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _jpeg_pair(img: int) -> tuple[bytes, bytes]:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    # natural-ish content (smooth gradients + blocks) so JPEG size/decode
    # cost is realistic rather than noise-image worst-case
    y, x = np.mgrid[0:img, 0:img]
    base = (96 + 64 * np.sin(x / 37.0) + 48 * np.cos(y / 53.0))
    rgb = np.stack([base, base[::-1], base.T[:img, :img]], -1)
    rgb = np.clip(rgb + rng.normal(0, 8, rgb.shape), 0, 255).astype("uint8")

    def enc(a):
        buf = io.BytesIO()
        Image.fromarray(a).save(buf, "JPEG", quality=85)
        return buf.getvalue()

    return enc(rgb), enc(255 - rgb)


def _post(url: str, payload: bytes, timeout: float = 300.0) -> float:
    req = urllib.request.Request(
        url, data=payload, headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = resp.read()
        assert resp.status == 200, resp.status
    json.loads(body)  # include response parse in the round trip
    return time.perf_counter() - t0


def _closed_loop(url: str, payload: bytes, concurrency: int,
                 n_requests: int) -> tuple[list[float], float]:
    """``concurrency`` client threads issue ``n_requests`` total requests
    back-to-back; returns (per-request latencies, wall seconds)."""
    lat: list[float] = []
    lock = threading.Lock()
    counter = {"left": n_requests}

    def worker():
        while True:
            with lock:
                if counter["left"] <= 0:
                    return
                counter["left"] -= 1
            dt = _post(url, payload)
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return lat, time.perf_counter() - t0


def main(argv=None):
    ap = argparse.ArgumentParser("serve_bench")
    ap.add_argument("--cfg", default="yolov5s_gpt4")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--nc", type=int, default=6)
    ap.add_argument("--concurrency", type=int, default=32)
    ap.add_argument("--requests", type=int, default=200,
                    help="total requests at the throughput point")
    ap.add_argument("--latency-requests", type=int, default=200,
                    help="requests at the c=1 latency point (p99 needs a "
                         "real sample, not the max of ~24)")
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--max-wait-ms", type=float, default=3.0)
    ap.add_argument("--cpu-ok", action="store_true")
    ap.add_argument("--no-stage", action="store_true",
                    help="don't append records to BENCH_partial.json")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from bench import _stage_partial
    from mmidet_tpu.cli.val import load_model_and_vars
    from mmidet_tpu.deploy.serve import (BatchingService, make_handler)

    dev = jax.devices()[0]
    if dev.platform != "tpu" and not args.cpu_ok:
        raise SystemExit(f"serving bench wants the real TPU, got "
                         f"{dev.platform!r} (use --cpu-ok for a smoke run)")

    model, variables, _ = load_model_and_vars(args.cfg, "", nc=args.nc)
    names = [str(i) for i in range(args.nc)]
    svc = BatchingService(model, variables, names, img_size=args.img,
                          conf_thres=0.25, max_batch=args.max_batch,
                          max_wait_ms=args.max_wait_ms)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_port}/v1/detect"

    rgb, ir = _jpeg_pair(args.img)
    payload = json.dumps({"rgb": base64.b64encode(rgb).decode(),
                          "ir": base64.b64encode(ir).decode()}).encode()
    print(f"device={dev.device_kind} cfg={args.cfg} img={args.img} "
          f"payload={len(payload) / 1024:.0f} KiB", flush=True)

    def pct(v, q):
        return round(float(np.percentile(np.asarray(v) * 1e3, q)), 1)

    records = []
    try:  # an exception mid-benchmark must not leak the server/dispatcher
        for _ in range(4):  # warm the HTTP + decode + dispatch path
            _post(url, payload)

        # point 1: interactive latency (single closed-loop client)
        lat1, _ = _closed_loop(url, payload, 1,
                               max(args.latency_requests, args.max_batch))
        records.append({
            "metric": f"serve_{args.cfg}_{args.img}_c1_latency",
            "value": pct(lat1, 50), "unit": "ms_p50",
            "vs_baseline": -1.0, "p99_ms": pct(lat1, 99),
            "n": len(lat1), "device": dev.device_kind,
        })
        # point 2: sustained throughput under concurrency
        latC, wall = _closed_loop(url, payload, args.concurrency,
                                  args.requests)
        records.append({
            "metric": f"serve_{args.cfg}_{args.img}_"
                      f"c{args.concurrency}_throughput",
            "value": round(len(latC) / wall, 1), "unit": "req/s",
            "vs_baseline": -1.0, "p50_ms": pct(latC, 50),
            "p99_ms": pct(latC, 99), "n": len(latC),
            "max_batch": args.max_batch, "device": dev.device_kind,
        })
    finally:
        srv.shutdown()
        svc.close()
    for r in records:
        if not args.no_stage:
            _stage_partial(r)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
