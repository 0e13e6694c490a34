"""Tests for auxiliary subsystems: autoanchor, hyp evolution, metric logger,
hub API, export bundle, REST service, profiler cost."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


def test_autoanchor_kmeans_and_check():
    from mmidet_tpu.utils.autoanchor import (anchor_fitness, check_anchors,
                                             kmean_anchors)
    rng = np.random.default_rng(0)
    # two clusters of box sizes
    wh = np.concatenate([rng.normal(40, 4, (300, 2)),
                         rng.normal(120, 8, (300, 2))]).clip(4)
    k = kmean_anchors(wh, n=6, gen=100)
    assert k.shape == (6, 2)
    fit, bpr, _ = anchor_fitness(k, wh)
    assert bpr > 0.95

    labels = [np.asarray([[0, 0.5, 0.5, 0.1, 0.1]], np.float32)] * 10
    shapes = [(640, 640)] * 10
    anchors = np.asarray([[[10, 13], [16, 30], [33, 23]],
                          [[30, 61], [62, 45], [59, 119]],
                          [[116, 90], [156, 198], [373, 326]]], float)
    out = check_anchors(labels, shapes, anchors, (8, 16, 32))
    assert out.shape == (3, 3, 2)


def test_evolve_mutation_respects_bounds():
    from mmidet_tpu.train.evolve import META, mutate
    from mmidet_tpu.train.trainer import DEFAULT_HYP
    rng = np.random.default_rng(0)
    hyp = dict(DEFAULT_HYP)
    for _ in range(20):
        hyp = mutate(hyp, [(0.5, hyp)], rng)
    for k, (g, lo, hi) in META.items():
        if k in hyp:
            assert lo <= hyp[k] <= hi, k
    # zero-gain keys never move
    assert hyp["fliplr"] == DEFAULT_HYP["fliplr"]


def test_metric_logger(tmp_path):
    from mmidet_tpu.utils.logger import MetricLogger
    lg = MetricLogger(str(tmp_path))
    lg.log_metrics(0, {"loss": 1.0})
    lg.log_metrics(1, {"loss": 0.5, "map": 0.1})
    lg.close()
    lines = open(os.path.join(tmp_path, "metrics.jsonl")).read().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["map"] == 0.1


def test_hub_single_stream(tmp_path):
    from mmidet_tpu import hub
    m = hub.yolov5s(nc=3, img_size=64)
    img = (np.random.default_rng(0).uniform(
        0, 255, (80, 100, 3))).astype(np.uint8)
    det = m(img)
    assert det.n == 1
    assert isinstance(det.pandas()[0], list)
    paths = det.save(str(tmp_path))
    assert os.path.isfile(paths[0])
    # ref Detections surface: tolist / crop / print
    per_img = det.tolist()
    assert len(per_img) == 1 and per_img[0].n == 1
    crops = det.crop(str(tmp_path / "crops"))
    assert len(crops) == sum(len(r) for r in det.records)
    if crops:
        assert crops[0].ndim == 3
    det.print()


def test_hub_augment_flag(tmp_path):
    """TTA is reachable through the hub API: constructor kwarg works, and
    flipping .augment after a first inference retraces (the flags are
    static jit args, not trace-time closures)."""
    from mmidet_tpu import hub
    m = hub.yolov5s(nc=3, img_size=64, augment=True)
    img = (np.random.default_rng(0).uniform(
        0, 255, (64, 64, 3))).astype(np.uint8)
    det_tta = m(img)
    assert det_tta.n == 1
    m.augment = False
    det_plain = m(img)  # must retrace, not reuse the TTA trace
    assert det_plain.n == 1
    m.conf = 0.9999     # raising conf post-hoc must also take effect
    det_high = m(img)
    assert sum(len(r) for r in det_high.records) <= \
        sum(len(r) for r in det_plain.records)


def test_export_bundle_roundtrip(tmp_path):
    from mmidet_tpu.deploy.export import (export_deploy_bundle,
                                          load_deploy_bundle)
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    spec = two_stream_spec("s", "add", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="off")
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, x, train=False)
    path = export_deploy_bundle(str(tmp_path / "bundle"), model, v, spec,
                                names=["a", "b"], img_size=32)
    spec2, v2, meta = load_deploy_bundle(path)
    assert spec2 == spec
    assert meta["names"] == ["a", "b"]
    out1 = model.apply(v, x, x, train=False)["pred"]
    model2 = TwoStreamDetector(spec=spec2, aux_mode="off")
    out2 = model2.apply(v2, x, x, train=False)["pred"]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5)


def test_stablehlo_export_runs():
    from mmidet_tpu.deploy.export import export_stablehlo, load_stablehlo
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    spec = two_stream_spec("s", "add", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="off")
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, x, train=False)
    blob = export_stablehlo(model, v, img_size=32, batch_size=1)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000
    fn = load_stablehlo(blob)
    out = fn(np.zeros((1, 32, 32, 3), np.float32),
             np.zeros((1, 32, 32, 3), np.float32))
    assert np.asarray(out).shape[0] == 1


def test_rest_service(tmp_path):
    import io
    import threading
    import urllib.request
    import base64
    from PIL import Image
    from mmidet_tpu.deploy.serve import DetectionService, make_handler
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    from http.server import HTTPServer

    spec = two_stream_spec("s", "add", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="off")
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, x, train=False)
    svc = DetectionService(model, v, ["a", "b"], img_size=32,
                           conf_thres=1e-4)
    srv = HTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    buf = io.BytesIO()
    Image.fromarray(np.full((40, 40, 3), 200, np.uint8)).save(buf, "PNG")
    payload = json.dumps({
        "rgb": base64.b64encode(buf.getvalue()).decode(),
    }).encode()
    req = urllib.request.Request(f"http://127.0.0.1:{port}/v1/detect",
                                 data=payload, method="POST")
    with urllib.request.urlopen(req, timeout=120) as resp:
        records = json.loads(resp.read())
    assert isinstance(records, list)
    srv.shutdown()


def test_model_cost_analysis():
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    from mmidet_tpu.utils.profiler import model_cost
    spec = two_stream_spec("s", "add", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="off")
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, x, train=False)
    cost = model_cost(model, v, x, x, train=False)
    assert cost["gflops"] > 0 and cost["params_m"] > 1


def test_model_summary():
    from mmidet_tpu.models.summary import summarize
    from mmidet_tpu.models.zoo import two_stream_spec
    spec = two_stream_spec("l", "fourier", nc=6)
    out = summarize(spec, 640)
    lines = out.splitlines()
    assert len(lines) == 52  # header + 50 layers + footer
    assert "GPT1_fourier" in out and "Detect" in out
    assert "layers: 50" in lines[-1]


def test_confusion_matrix_in_eval(tmp_path):
    import jax.numpy as jnp
    from mmidet_tpu.data.datasets import PairedDataset, load_data_yaml
    from mmidet_tpu.data.loader import PairedLoader
    from mmidet_tpu.data.synthetic import make_synthetic_pair_dataset
    from mmidet_tpu.eval.evaluator import evaluate
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    yml = make_synthetic_pair_dataset(str(tmp_path), n=4, img=96)
    d = load_data_yaml(yml)
    ds = PairedDataset(d["train_rgb"], d["train_ir"], nc=2,
                       cache_dir=str(tmp_path))
    spec = two_stream_spec("s", "add", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="off")
    small = jnp.zeros((1, 32, 32, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, small, small)
    res = evaluate(model, v, PairedLoader(ds, 2, 64, drop_last=False), nc=2,
                   confusion_dir=str(tmp_path / "cm"))
    assert (tmp_path / "cm" / "confusion_matrix.txt").exists()


def test_plot_lr_and_evolve(tmp_path):
    import json
    from mmidet_tpu.train.schedule import ScheduleConfig
    from mmidet_tpu.utils.plots import plot_evolve, plot_lr_schedule
    p = plot_lr_schedule(ScheduleConfig(epochs=5, steps_per_epoch=10,
                                        warmup_floor=5),
                         str(tmp_path / "lr.png"))
    assert os.path.isfile(p)
    ev = tmp_path / "evolve.txt"
    with open(ev, "w") as fh:
        for g in range(4):
            fh.write(json.dumps({"gen": g, "fitness": 0.1 * g,
                                 "hyp": {"lr0": 0.01 + g * 1e-3,
                                         "momentum": 0.9}}) + "\n")
    p2 = plot_evolve(str(ev))
    assert os.path.isfile(p2)


def test_get_latest_run_finds_newest_ckpt_dir(tmp_path):
    """--resume latest resolves to the most recent run dir containing an
    orbax ckpt/ (ref get_latest_run semantics on our layout)."""
    import time as _time

    from mmidet_tpu.utils.general import get_latest_run
    for name in ("exp", "exp2", "exp3"):
        (tmp_path / name / "ckpt").mkdir(parents=True)
        _time.sleep(0.05)
    assert get_latest_run(str(tmp_path)).endswith("exp3")
    assert get_latest_run(str(tmp_path / "nothing_here")) == ""
