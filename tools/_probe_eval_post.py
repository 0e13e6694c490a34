"""Probe: host-side eval post-processing cost at M3FD-val scale
(VERDICT r3 #8 / weak #5).

The eval matching loop (eval/metrics.py match_predictions + ap_per_class)
is per-image host numpy — correct and parity-pinned, but unmeasured at
real-val scale.  This probe times it standalone on synthetic stats shaped
like a converged detector's output (n_img x ~300 kept preds after NMS,
~15 labels/img, 6 classes, 10 IoU thresholds) and prints ms/img + the
share it would take of a full eval epoch at the measured chip forward
rate (0.63 ms/img, BENCH_partial 2026-08-20).

Result (2026-08-20, this box, n_img=4000): see PERF.md "Eval
post-processing cost".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mmidet_tpu.eval.metrics import ap_per_class, match_predictions


def synth_stats(n_img: int, n_pred: int = 300, n_lab: int = 15,
                nc: int = 6, seed: int = 0):
    rng = np.random.default_rng(seed)
    iouv = np.linspace(0.5, 0.95, 10)
    per_image = []
    for _ in range(n_img):
        # labels: random boxes in a 640 frame
        m = rng.integers(3, n_lab + 1)
        cxy = rng.uniform(50, 590, (m, 2))
        wh = rng.uniform(20, 120, (m, 2))
        lab = np.concatenate([rng.integers(0, nc, (m, 1)).astype(np.float64),
                              cxy - wh / 2, cxy + wh / 2], 1)
        # preds: half jittered copies of labels (TPs), half noise
        k = rng.integers(n_pred // 2, n_pred + 1)
        idx = rng.integers(0, m, k)
        jitter = rng.normal(0, 6, (k, 4))
        boxes = lab[idx, 1:5] + jitter
        flip = rng.random(k) < 0.5
        noise = np.concatenate([rng.uniform(0, 560, (k, 2))] * 2, 1) \
            + np.asarray([0, 0, 60, 60.0])
        boxes = np.where(flip[:, None], noise, boxes)
        conf = rng.uniform(0.001, 1.0, (k, 1))
        cls = np.where(rng.random(k) < 0.8, lab[idx, 0],
                       rng.integers(0, nc, k)).astype(np.float64)[:, None]
        pred = np.concatenate([boxes, conf, cls], 1)
        per_image.append((pred, lab, iouv))
    return per_image, iouv


def main():
    n_img = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    per_image, iouv = synth_stats(n_img)

    t0 = time.perf_counter()
    stats = []
    for pred, lab, iouv_ in per_image:
        correct = match_predictions(pred, lab, iouv_)
        stats.append((correct, pred[:, 4], pred[:, 5], lab[:, 0]))
    t_match = time.perf_counter() - t0

    t0 = time.perf_counter()
    cat = [np.concatenate(x, 0) for x in zip(*stats)]
    p, r, ap, f1, cls = ap_per_class(*cat)
    t_ap = time.perf_counter() - t0

    ms_match = t_match / n_img * 1e3
    chip_ms = 0.63  # measured bf16 gpt4-s forward ms/img (BENCH_partial)
    share = ms_match / (ms_match + chip_ms)
    print(f"n_img={n_img}: match {t_match:.2f}s ({ms_match:.3f} ms/img), "
          f"ap_per_class {t_ap:.2f}s "
          f"({t_ap / n_img * 1e3:.3f} ms/img amortized)")
    print(f"vs chip forward {chip_ms} ms/img -> matching would be "
          f"{share * 100:.0f}% of a (sequential) eval epoch; "
          f"mAP50={ap[:, 0].mean():.3f}")


if __name__ == "__main__":
    main()
