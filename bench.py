"""Throughput benchmark: paired 640px VIS-IR inference on the real chip.

North-star metric (BASELINE.md): >= 2000 paired 640px img/s/chip at
yolov5s-twostream.  Prints ONE JSON line (the driver parses the LAST
stdout line):
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

Robustness (this file is the round's official perf evidence channel —
round 1 lost its record to a tunnel outage, round 3 lost it to the
driver's timeout outlasting bench's own retry budget, BENCH_r03.json
rc=124 parsed=null):

  * the parent process NEVER imports jax — when the axon relay is down,
    ``import jax`` itself hangs in every process (sitecustomize dials the
    dead relay), so all jax work happens in a child subprocess under a
    hard timeout;
  * the FAILURE path is bounded well under any plausible driver window:
    probe 30 s, <=3 attempts, 20 s backoff, 300 s total budget (~150 s
    worst case dead-relay);
  * a machine-readable provisional record (value 0.0 + the most recent
    staged measurement flagged stale) is printed IMMEDIATELY at the first
    probe failure — and again before the first long-running measurement
    child — so a driver kill at ANY later point still leaves a parseable
    last line on stdout; a successful measurement then overwrites it by
    printing the fresh record as the new last line;
  * the child stages each measured config to BENCH_partial.json AS
    MEASURED, so a mid-run crash still leaves a parseable record.

The measured program is the full detector forward (bf16, NHWC, BN folded)
including the on-device Detect decode; NMS timing is reported separately
on stderr (the reference also reports an inference/NMS split,
test.py:261-263).  Timing is an on-device lax.scan loop whose carry feeds
the inputs — per-call dispatch + host sync over the tunnel would otherwise
dominate (~2.4 ms/op), and a carry-independent body would be hoisted.

Captured in one driver invocation (each staged under its own stable
metric name; the headline stays bf16 gpt4-s):
  * yolov5s_twostream_640_paired_inference          (headline, batch 128)
  * yolov5s_twostream_add_640_paired_inference      (reference's shipped
    fusion_add variant)
  * yolov5s_twostream_640_paired_inference_s8       (opt-in s8-storage
    deploy mode, nn/quant.py)
  * yolov5l_fuse3_fourier_640_paired_inference      (the paper's headline
    model, reference train.py:950 default cfg)
  * yolov5s_twostream_640_mosaic_train              (end-to-end training:
    fused step+aug hot loop, reference train.py:712-825)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_IMG_S = 2000.0
_VARIANT = os.environ.get("BENCH_VARIANT", "gpt4")
# the headline metric name stays stable for the driver; variant runs
# stage under their own name
METRIC = "yolov5s_twostream_640_paired_inference" if _VARIANT == "gpt4" \
    else f"yolov5s_twostream_{_VARIANT}_640_paired_inference"
PARTIAL_PATH = os.environ.get(
    "BENCH_PARTIAL_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "BENCH_partial.json"))


def _metric_name(variant: str, scale: str = "s") -> str:
    if scale == "l":
        return f"yolov5l_fuse3_{variant}_640_paired_inference"
    return ("yolov5s_twostream_640_paired_inference" if variant == "gpt4"
            else f"yolov5s_twostream_{variant}_640_paired_inference")


def _measure_variant(variant: str, batch: int, with_nms: bool, *,
                     scale: str = "s", quant: bool = False) -> dict:
    """Measure one two-stream variant on the real chip; stages the record
    to BENCH_partial.json as measured and returns it."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    from mmidet_tpu.nn.fuse import fold_batchnorm
    from mmidet_tpu.ops.nms import non_max_suppression

    img = 640
    spec = two_stream_spec(scale, variant, nc=6)
    # deploy configuration: bf16, BN folded into convs (fuse_conv_and_bn
    # parity), batch sized to saturate the chip
    base = TwoStreamDetector(spec=spec, aux_mode="off", dtype=jnp.bfloat16)
    # quant=True: s8-storage conv stack (activations cross HBM as int8,
    # calibrated scales; nn/quant.py) — staged under a _s8 metric suffix
    model = TwoStreamDetector(
        spec=spec, aux_mode="off", fused=True, pallas_fusion=True,
        # the fused CEM kernel is probe-gated: flip on via env once
        # tools/_probe_cem.py has validated the Mosaic compile on hardware
        pallas_cem=os.environ.get("BENCH_PALLAS_CEM", "0") == "1",
        quant=quant, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(rng, (batch, img, img, 3), jnp.bfloat16)
    ir = jax.random.uniform(rng, (batch, img, img, 3), jnp.bfloat16)
    # init at 64px (params are resolution-independent) to keep the init
    # trace/compile cheap; apply at full 640px
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = fold_batchnorm(base.init(
        {"params": jax.random.PRNGKey(0)}, small, small, train=False))
    # deploy: cast params to bf16 (halves param HBM reads, removes the
    # per-op f32->bf16 converts)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    if quant:
        from mmidet_tpu.nn.quant import (calibrate_act_scales,
                                         quantized_variables)
        calib_model = TwoStreamDetector(spec=spec, aux_mode="off",
                                        fused=True, dtype=jnp.bfloat16)
        qcol = calibrate_act_scales(
            calib_model, variables,
            [(jax.random.uniform(rng, (2, img, img, 3), jnp.bfloat16),
              jax.random.uniform(rng, (2, img, img, 3), jnp.bfloat16))])
        variables = quantized_variables(variables, qcol)

    iters = int(os.environ.get("BENCH_ITERS", "8"))

    @jax.jit
    def loop(variables, r, i):
        def body(c, _):
            p = model.apply(variables, r + c, i, train=False)["pred"]
            return jnp.sum(p).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return c

    float(np.asarray(loop(variables, rgb, ir)))  # compile + warmup
    dt = float("inf")
    for _ in range(3):  # best-of-3: tunnel jitter is one-sided (slow-only)
        t0 = time.perf_counter()
        float(np.asarray(loop(variables, rgb, ir)))
        dt = min(dt, time.perf_counter() - t0)
    img_s = batch * iters / dt

    record = {
        "metric": _metric_name(variant, scale) + ("_s8" if quant else ""),
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
    }

    # NMS timing (reported separately, as the reference does at
    # test.py:261-263) — on by default so the official artifact carries
    # the full-pipeline split
    nms_ms = -1.0
    if with_nms:
        pred = jax.jit(lambda v, r, i: model.apply(
            v, r, i, train=False)["pred"])(variables, rgb, ir)
        nms = jax.jit(lambda p: non_max_suppression(p.astype(jnp.float32),
                                                    0.25, 0.45))
        d, v = nms(pred)
        np.asarray(d)
        t0 = time.perf_counter()
        for _ in range(5):
            d, v = nms(pred)
        np.asarray(d)
        nms_ms = (time.perf_counter() - t0) / 5 / batch * 1e3

    _stage_partial(dict(record, batch=batch, ms_per_img=round(1e3 / img_s, 3),
                        nms_ms_per_img=round(nms_ms, 3),
                        device=jax.devices()[0].device_kind))
    print(f"[{scale}/{variant}{'/s8' if quant else ''}] inference: "
          f"{1e3 / img_s:.2f} ms/img, "
          f"nms: {nms_ms:.2f} ms/img (-1 = skipped), batch={batch}, "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    return record


def _measure_train(batch: int = 16) -> dict:
    """End-to-end training throughput (VERDICT r4 #5): the trainer's fused
    hot-loop program — full train step (fwd + aux + detection loss + grad +
    SGD + EMA) pipelined with the full on-device mosaic/warp/HSV
    augmentation graph, the reference's train.py:712-825 configuration at
    yolov5s-gpt4 @640 bf16.  Staged as
    ``yolov5s_twostream_640_mosaic_train``."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmidet_tpu.data.augment import AugmentHyp, make_batch_augment
    from mmidet_tpu.losses.detection import LossHyp
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    from mmidet_tpu.train.optimizer import build_optimizer
    from mmidet_tpu.train.schedule import ScheduleConfig
    from mmidet_tpu.train.step import init_state, make_train_step
    from mmidet_tpu.train.trainer import _anchors_grid

    img, nt = 640, 60
    spec = two_stream_spec("s", "gpt4", nc=6)
    model = TwoStreamDetector(spec=spec, aux_mode="reference",
                              dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init({"params": rng}, small, small, train=False)
    tx, _ = build_optimizer(variables["params"], ScheduleConfig(), 5e-4,
                            total_batch_size=batch)
    state = init_state(model, tx, rng, small, small, variables=variables)
    step_fn = make_train_step(model, tx, _anchors_grid(spec), LossHyp())

    targets = jnp.tile(jnp.asarray([[0, 0.5, 0.5, 0.2, 0.3]], jnp.float32),
                       (batch, nt, 1))
    mask = jnp.ones((batch, nt), bool)
    rgbs = jax.random.uniform(rng, (batch, 4, img, img, 3), jnp.float32)
    raw = {"rgb4": rgbs, "ir4": rgbs,
           "labels4": jnp.tile(targets[:, None], (1, 4, 1, 1)),
           "mask4": jnp.tile(mask[:, None], (1, 4, 1))}
    aug = make_batch_augment(img, AugmentHyp(), nt, mosaic=True)
    cur = jax.jit(aug)(raw, rng)

    # the TRAINER'S actual hot-loop program and dispatch pattern
    # (trainer.py fused_fn): state round-trips the jit boundary every step,
    # per-step PRNG keys split host-side — so the measurement carries the
    # true step-to-step dependency.  (A state-independent scan body gets
    # hoisted/CSE'd by XLA and reads ~4x too fast — the round-4 staged
    # 398.4 img/s was measured that way and is corrected by this one.)
    @jax.jit
    def fused_fn(state, cur, raw_next, k_step, k_aug, loss_acc):
        state, metrics = step_fn(state, cur, k_step)
        nxt = aug(raw_next, k_aug)
        loss_acc = loss_acc + metrics["total"].astype(jnp.float32)
        return state, nxt, loss_acc

    iters = int(os.environ.get("BENCH_TRAIN_ITERS", "8"))

    def run_iters(state, cur):
        k = rng
        acc = jnp.float32(0.0)
        for _ in range(iters):
            k, k_s, k_a = jax.random.split(k, 3)
            state, cur, acc = fused_fn(state, cur, raw, k_s, k_a, acc)
        return float(np.asarray(acc))  # one host read, as the trainer does

    run_iters(state, cur)  # compile + warmup
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run_iters(state, cur)
        dt = min(dt, time.perf_counter() - t0)
    img_s = batch * iters / dt
    record = {
        "metric": "yolov5s_twostream_640_mosaic_train",
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
    }
    _stage_partial(dict(record, batch=batch,
                        ms_per_step=round(dt / iters * 1e3, 1),
                        device=jax.devices()[0].device_kind))
    import sys as _sys
    print(f"[train] fused step+aug: {dt / iters * 1e3:.1f} ms/step, "
          f"{img_s:.1f} img/s, batch={batch}", file=_sys.stderr)
    return record


def _measure():
    """Child process: the actual benchmark (requires the real TPU)."""
    import jax

    platform = jax.devices()[0].platform
    if platform != "tpu":
        raise RuntimeError(
            f"bench requires the real TPU, got platform={platform!r} "
            "(refusing to report CPU numbers as chip throughput)")

    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    variant = os.environ.get("BENCH_VARIANT", "gpt4")
    with_nms = os.environ.get("BENCH_NMS", "1") == "1"
    headline_quant = os.environ.get("BENCH_QUANT", "0") == "1"
    record = _measure_variant(variant, batch, with_nms, quant=headline_quant)

    # also capture the reference's lighter shipped yolov5s_fusion_add
    # variant, the opt-in s8-storage quant mode, and the paper's headline
    # yolov5l fuse3-fourier model inside the SAME driver invocation
    # (staged under their own metric names; the headline stays bf16
    # gpt4-s).  Best-effort: the headline must survive a variant-side
    # failure.
    def _try(label, fn):
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — headline already staged
            print(f"{label} capture failed (headline unaffected): {e}",
                  file=sys.stderr)

    if variant == "gpt4" and not headline_quant:
        if os.environ.get("BENCH_ADD_VARIANT", "1") == "1":
            _try("add-variant",
                 lambda: _measure_variant("add", batch, with_nms))
        if os.environ.get("BENCH_QUANT_VARIANT", "1") == "1":
            _try("quant", lambda: _measure_variant(
                "gpt4", batch, with_nms=False, quant=True))
        if os.environ.get("BENCH_FLAGSHIP_VARIANT", "1") == "1":
            # best measured operating point for the 208M-param flagship is
            # batch 128 (PERF.md "Paper-flagship throughput": 546 img/s;
            # batch 32 under-fills the chip at 421)
            _try("flagship", lambda: _measure_variant(
                "fourier", int(os.environ.get("BENCH_FLAGSHIP_BATCH", "128")),
                with_nms, scale="l"))
        if os.environ.get("BENCH_TRAIN_VARIANT", "1") == "1":
            # training throughput is an official tracked metric since
            # round 5 (VERDICT r4 #5) — reference analog: the epoch hot
            # loop, train.py:712-825
            # batch 64 is the measured optimum (sweep 2026-08-21:
            # 92.9 @16, 109.5 @32, 127.9 @64, OOM @128 — the raw 4-image
            # mosaic inputs alone are 5 GB at 128)
            _try("train", lambda: _measure_train(
                int(os.environ.get("BENCH_TRAIN_BATCH", "64"))))

    print(json.dumps(record), flush=True)


def _stage_partial(record: dict) -> None:
    """Append a measured record to BENCH_partial.json (one JSON per line)."""
    record = dict(record, ts=time.strftime("%Y-%m-%dT%H:%M:%S"))
    try:
        with open(PARTIAL_PATH, "a") as f:
            f.write(json.dumps(record) + "\n")
    except OSError:
        pass


def _last_partial() -> dict | None:
    """Most recent staged headline measurement, if any."""
    try:
        with open(PARTIAL_PATH) as f:
            lines = [json.loads(x) for x in f if x.strip()]
    except (OSError, ValueError):
        return None
    lines = [r for r in lines if r.get("metric") == METRIC
             and r.get("value", 0) > 0]
    return lines[-1] if lines else None


def _probe_tpu(timeout: int) -> str | None:
    """Cheap child probe: is the TPU reachable AND usable?  Returns None if
    yes, else the error string.  A dead relay makes ``import jax`` HANG
    (not raise), so the probe runs in its own subprocess under a short
    timeout.  The probe executes one tiny real op: device enumeration alone
    passes on a broken client (round 2: a libtpu AOT/terminal version
    mismatch raised only at first dispatch, MULTICHIP_r02.json), and the
    mismatch must be caught in this cheap gate, not mid-measurement."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; d = jax.devices(); "
             "assert d[0].platform == 'tpu', d; "
             "s = float(jnp.ones(8).sum()); assert s == 8.0, s; "
             "print(d[0].device_kind)"],
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return f"probe hang >{timeout}s (axon relay down)"
    if proc.returncode != 0:
        err = proc.stderr.strip().splitlines()
        return f"probe rc={proc.returncode}: {err[-1] if err else 'no output'}"
    return None


def _error_record(reason: str) -> dict:
    """Machine-readable failure record in the one-line-JSON shape.  If a
    previous successful measurement was staged, surface it (flagged as
    stale) so the round is not recorded as zero-evidence."""
    record = {
        "metric": METRIC,
        "value": 0.0,
        "unit": "img/s",
        "vs_baseline": 0.0,
        "error": reason,
    }
    prev = _last_partial()
    if prev is not None:
        record["stale_previous_measurement"] = {
            "value": prev["value"], "ts": prev.get("ts")}
    return record


def main():
    # Failure-path wall-clock is bounded WELL under the driver's window
    # (round 3: the driver killed bench at ~16 min mid-retry and the record
    # was never printed).  Worst case dead relay: 3 x (60 s probe + 20 s
    # backoff) = 240 s, then the final record.  The measurement child gets
    # a larger window (compile + 4 variants), but a provisional record is
    # already on stdout before it launches, so a driver kill mid-child
    # still leaves a parseable last line.
    # Probe timeout is 60 s, not 30: a LIVE relay's first dispatch in a
    # fresh process measured 38.5 s (round 4) — 30 s false-negatives a
    # cold-but-healthy tunnel into the dead-relay path.
    timeout = int(os.environ.get("BENCH_TIMEOUT", "900"))
    probe_timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT", "60"))
    retries = int(os.environ.get("BENCH_RETRIES", "2"))
    backoff = int(os.environ.get("BENCH_BACKOFF", "20"))
    budget = int(os.environ.get("BENCH_TOTAL_BUDGET", "300"))
    t_start = time.monotonic()

    provisional_emitted = False

    def _emit_provisional(reason: str) -> None:
        # printed at most once, immediately at the first failure (or just
        # before the first long-running child) — the driver parses the
        # LAST stdout line, so a later success line supersedes this one
        nonlocal provisional_emitted
        if provisional_emitted:
            return
        provisional_emitted = True
        print(json.dumps(_error_record(reason)), flush=True)

    last_err = "unknown"
    for attempt in range(retries + 1):
        if time.monotonic() - t_start > budget:
            last_err = f"total budget {budget}s exhausted ({last_err})"
            break
        # cheap reachability gate first: a hung tunnel costs probe_timeout,
        # not the full measurement timeout
        probe_err = _probe_tpu(probe_timeout)
        if probe_err is not None:
            last_err = probe_err
            print(f"bench attempt {attempt + 1}: {last_err}", file=sys.stderr)
            _emit_provisional(f"provisional (attempt {attempt + 1}): "
                              + last_err)
            if attempt < retries:
                time.sleep(backoff)
            continue
        _emit_provisional("provisional: measurement child launched "
                          "(overwritten by the fresh record on success)")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 *sys.argv[1:]],
                capture_output=True, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            last_err = f"timeout after {timeout}s (tunnel hang?)"
            print(f"bench attempt {attempt + 1}: {last_err}", file=sys.stderr)
        else:
            sys.stderr.write(proc.stderr[-4000:])
            out = [ln for ln in proc.stdout.splitlines() if ln.strip()]
            if proc.returncode == 0 and out:
                print(out[-1], flush=True)  # the one fresh JSON line (last)
                return
            last_err = (f"rc={proc.returncode}: "
                        + (proc.stderr.strip().splitlines()[-1]
                           if proc.stderr.strip() else "no output"))
            print(f"bench attempt {attempt + 1} failed: {last_err}",
                  file=sys.stderr)
        if attempt < retries:
            time.sleep(backoff)

    # all attempts failed: the final record (supersedes the provisional —
    # same shape, fresher reason)
    print(json.dumps(_error_record(
        f"tpu unavailable after {retries + 1} attempts: {last_err}")),
        flush=True)
    sys.exit(0)  # the JSON error record IS the result; rc=0 so it's recorded


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _measure()
    else:
        main()
