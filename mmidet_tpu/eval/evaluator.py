"""mAP evaluation driver: batched jitted inference + on-device NMS, host-side
IoU matching and AP aggregation.

Functional parity surface: reference ``test.test`` (``test.py:21-308``) —
conf 0.001 / iou 0.6 multi-label NMS, 10 IoU thresholds 0.5:0.95, P/R at
max F1, mAP@.5 / mAP@.75 / mAP@.5:.95, per-class table, speed report.
"""

from __future__ import annotations

import dataclasses
import time
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from mmidet_tpu.eval.metrics import (ap_per_class, coco80_to_coco91_class,
                                      match_predictions)
from mmidet_tpu.ops.nms import non_max_suppression

# persistent jit cache: defining the jitted infer inside evaluate() would
# re-trace and re-compile on every call (every eval epoch).  LRU-bounded:
# each entry pins a compiled executable AND the closed-over model, so an
# unbounded dict leaks both across long-lived processes (serve, evolve,
# study sweeps)
_INFER_CACHE_MAX = 8
_INFER_CACHE: "OrderedDict" = OrderedDict()


def _get_infer(model, conf_thres, iou_thres, max_det, two_stream,
               augment=False, merge=False):
    try:
        key = (model, conf_thres, iou_thres, max_det, two_stream, augment,
               merge)
        hash(key)
    except TypeError:
        key = (id(model), conf_thres, iou_thres, max_det, two_stream,
               augment, merge)
    if key in _INFER_CACHE:
        _INFER_CACHE.move_to_end(key)
    else:
        @jax.jit
        def infer(variables, rgb, ir):
            def fwd(r, i=None):
                out = model.apply(variables, r, i, train=False) \
                    if two_stream else model.apply(variables, r, train=False)
                return out["pred"]
            if augment:  # TTA (ref test.py --augment)
                from mmidet_tpu.models.tta import forward_tta
                pred = forward_tta(fwd, rgb, ir if two_stream else None,
                                   gs=int(max(model.spec.strides)))
            else:
                pred = fwd(rgb, ir) if two_stream else fwd(rgb)
            # pre_nms_topk matches the reference eval protocol's max_nms
            # (general.py:555-557): at conf 0.001 + multi_label the
            # candidate pool easily exceeds the 4096 deploy default, and a
            # smaller pool truncates the recall-curve tail
            return non_max_suppression(
                pred.astype(jnp.float32), conf_thres=conf_thres,
                iou_thres=iou_thres, max_det=max_det,
                pre_nms_topk=30000, multi_label=True, merge=merge)
        _INFER_CACHE[key] = infer
        while len(_INFER_CACHE) > _INFER_CACHE_MAX:
            _INFER_CACHE.popitem(last=False)
    return _INFER_CACHE[key]


@dataclasses.dataclass
class EvalResults:
    mp: float
    mr: float
    map50: float
    map75: float
    map: float
    per_class: dict
    speed_ms: tuple[float, float]   # inference, nms per image
    nc: int

    def fitness_vector(self) -> np.ndarray:
        return np.asarray([[self.mp, self.mr, self.map50, self.map]])


def _scale_boxes(boxes: np.ndarray, ratio_pad, orig_shape) -> np.ndarray:
    """Letterboxed xyxy -> original-image coordinates (ref scale_coords)."""
    r, (dw, dh) = ratio_pad
    out = boxes.copy()
    out[:, [0, 2]] = (out[:, [0, 2]] - dw) / r
    out[:, [1, 3]] = (out[:, [1, 3]] - dh) / r
    h, w = orig_shape
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, w)
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, h)
    return out


def evaluate(model, variables, loader, nc: int,
             conf_thres: float = 0.001, iou_thres: float = 0.6,
             max_det: int = 300, names=None, two_stream: bool = True,
             verbose: bool = False, save_json: str | None = None,
             confusion_dir: str | None = None,
             augment: bool = False, coco91: bool = False,
             media_dir: str | None = None,
             media_max: int = 16,
             save_txt_dir: str | None = None,
             save_conf: bool = False,
             save_hybrid: bool = False,
             merge: bool = False,
             shard: bool = True,
             devices=None) -> EvalResults:
    """``save_json``: optional COCO-format detection dump (ref test.py
    --save-json).  ``confusion_dir``: write an IoU-matched confusion matrix
    (ref test.py ConfusionMatrix + plot).  ``augment``: TTA — three
    scale/flip passes concatenated before NMS (ref test.py --augment).
    ``coco91``: map 80-index class ids to the COCO-paper 91-index ids in
    the JSON (ref test.py:91 coco80_to_coco91_class, applied when the
    dataset is COCO).  ``media_dir``: write up to ``media_max`` val images
    annotated with predicted boxes (the reference's per-interval W&B bbox
    media panels, test.py:174-182 / --bbox_interval).  ``save_txt_dir``:
    one ``<stem>.txt`` per image with predictions as ``cls xywh`` normalized
    to the ORIGINAL frame (+``conf`` when ``save_conf``); ``save_hybrid``
    appends the ground-truth labels too (ref test.py:146-171 --save-txt /
    --save-conf / --save-hybrid)."""
    iouv = np.linspace(0.5, 0.95, 10)
    json_records = []
    cls_map = coco80_to_coco91_class() if coco91 else None
    cm = None
    if confusion_dir is not None:
        from mmidet_tpu.eval.metrics import ConfusionMatrix
        cm = ConfusionMatrix(nc)
    infer_fn = _get_infer(model, conf_thres, iou_thres, max_det, two_stream,
                          augment, merge=merge)

    # Data-parallel eval over all local devices (VERDICT r4 #6): the batch
    # dim shards over a 1-D 'data' mesh, params replicate — the same
    # pattern as deploy/serve.py; the forward has no cross-example math, so
    # results are identical to single-device.  Reference eval is
    # rank-0-only (test.test is called on rank 0, train.py:842-844); on TPU
    # the data axis is free parallelism.
    bsh = n_dev = None
    devs = list(jax.devices() if devices is None else devices)
    if shard and len(devs) > 1:
        from mmidet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                              replicated)
        mesh = make_mesh(n_data=len(devs), n_model=1, devices=devs)
        bsh = batch_sharding(mesh)
        variables = jax.device_put(variables, replicated(mesh))
        n_dev = len(devs)

    def infer(rgb, ir):
        return infer_fn(variables, rgb, ir)

    stats = []
    t_inf = t_nms = 0.0
    n_img = 0
    n_media = 0
    for batch in loader:
        rgb = np.asarray(batch["rgb"], np.float32) / 255.0
        ir = np.asarray(batch["ir"], np.float32) / 255.0
        b0 = rgb.shape[0]
        t0 = time.perf_counter()
        if bsh is not None:
            pad = (-b0) % n_dev  # ragged final batch -> shardable size
            if pad:
                rgb = np.concatenate(
                    [rgb, np.zeros((pad,) + rgb.shape[1:], rgb.dtype)])
                ir = np.concatenate(
                    [ir, np.zeros((pad,) + ir.shape[1:], ir.dtype)])
            rgb = jax.device_put(rgb, bsh)
            ir = jax.device_put(ir, bsh)
        else:
            rgb, ir = jnp.asarray(rgb), jnp.asarray(ir)
        dets, valid = infer(rgb, ir)
        dets = np.asarray(jax.block_until_ready(dets))[:b0]
        valid = np.asarray(valid)[:b0]
        t_inf += time.perf_counter() - t0
        n_img += b0

        ih, iw = rgb.shape[1], rgb.shape[2]
        for si in range(b0):
            d = dets[si][valid[si]]
            lab = batch["targets"][si][batch["mask"][si]]
            orig_shape, ratio_pad = batch["shapes"][si]
            # labels: normalized xywh in padded frame -> xyxy original px
            if len(lab):
                l_xyxy = np.empty((len(lab), 5), np.float32)
                l_xyxy[:, 0] = lab[:, 0]
                cx, cy = lab[:, 1] * iw, lab[:, 2] * ih
                w, h = lab[:, 3] * iw, lab[:, 4] * ih
                l_xyxy[:, 1], l_xyxy[:, 2] = cx - w / 2, cy - h / 2
                l_xyxy[:, 3], l_xyxy[:, 4] = cx + w / 2, cy + h / 2
                l_xyxy[:, 1:] = _scale_boxes(l_xyxy[:, 1:], ratio_pad,
                                             orig_shape)
            else:
                l_xyxy = np.zeros((0, 5), np.float32)
            if media_dir is not None and n_media < media_max:
                import os
                from mmidet_tpu.utils.plots import plot_one_box
                os.makedirs(media_dir, exist_ok=True)
                img8 = (np.asarray(rgb[si]) * 255).astype(np.uint8).copy()
                for x1, y1, x2, y2, conf, cls in d:  # letterboxed-frame px
                    nm = (names[int(cls)] if names is not None
                          and int(cls) < len(names) else str(int(cls)))
                    plot_one_box((x1, y1, x2, y2), img8,
                                 label=f"{nm} {conf:.2f}")
                from PIL import Image as _Image
                _Image.fromarray(img8).save(
                    os.path.join(media_dir, f"val_{n_media:03d}.jpg"))
                n_media += 1
            if len(d):
                d = d.copy()
                d[:, :4] = _scale_boxes(d[:, :4], ratio_pad, orig_shape)
            if save_txt_dir is not None:
                import os
                os.makedirs(save_txt_dir, exist_ok=True)
                files = batch.get("files")
                stem = os.path.splitext(os.path.basename(
                    files[si]))[0] if files else f"img{n_img - b0 + si}"
                oh, ow = orig_shape
                lines = []
                for x1, y1, x2, y2, conf, cls in d:
                    xywh = ((x1 + x2) / 2 / ow, (y1 + y2) / 2 / oh,
                            (x2 - x1) / ow, (y2 - y1) / oh)
                    row = (int(cls), *xywh) + ((float(conf),) if save_conf
                                               else ())
                    lines.append(" ".join(f"{v:.6g}" for v in row))
                if save_hybrid:  # append GT for auto-labelling (ref)
                    for c_, x1, y1, x2, y2 in l_xyxy:
                        xywh = ((x1 + x2) / 2 / ow, (y1 + y2) / 2 / oh,
                                (x2 - x1) / ow, (y2 - y1) / oh)
                        lines.append(" ".join(
                            f"{v:.6g}" for v in (int(c_), *xywh)))
                with open(os.path.join(save_txt_dir, stem + ".txt"),
                          "w") as fh:
                    fh.write("\n".join(lines) + ("\n" if lines else ""))
            if cm is not None:
                cm.process_batch(d, l_xyxy)
            correct = match_predictions(d, l_xyxy, iouv)
            stats.append((correct, d[:, 4] if len(d) else np.zeros(0),
                          d[:, 5] if len(d) else np.zeros(0),
                          l_xyxy[:, 0]))
            if save_json is not None:
                import os
                files = batch.get("files")
                stem = os.path.splitext(os.path.basename(
                    files[si]))[0] if files else str(si)
                # numeric stems become ints (ref test.py:189) — COCO
                # ground truth uses int ids, string '000139' matches nothing
                image_id = int(stem) if stem.isnumeric() else stem
                for x1, y1, x2, y2, conf, cls in d:
                    json_records.append({
                        "image_id": image_id,
                        "category_id": cls_map[int(cls)] if cls_map
                        else int(cls),
                        "bbox": [float(x1), float(y1),
                                 float(x2 - x1), float(y2 - y1)],
                        "score": float(conf)})

    if save_json is not None:
        import json as _json
        with open(save_json, "w") as fh:
            _json.dump(json_records, fh)
    if cm is not None:
        import os
        os.makedirs(confusion_dir, exist_ok=True)
        np.savetxt(os.path.join(confusion_dir, "confusion_matrix.txt"),
                   cm.matrix, fmt="%d")
        try:
            from mmidet_tpu.utils.plots import plot_confusion_matrix
            plot_confusion_matrix(cm.matrix, names or
                                  [str(i) for i in range(nc)],
                                  os.path.join(confusion_dir,
                                               "confusion_matrix.png"))
        except Exception:
            pass
    stats = [np.concatenate(x, 0) for x in zip(*stats)]
    per_class = {}
    if len(stats) and stats[0].any():
        p, r, ap, f1, cls_ids = ap_per_class(*stats)
        ap50, ap75, ap_mean = ap[:, 0], ap[:, 5], ap.mean(1)
        mp, mr = p.mean(), r.mean()
        map50, map75, map_ = ap50.mean(), ap75.mean(), ap_mean.mean()
        for i, c in enumerate(cls_ids):
            name = names[c] if names else str(c)
            per_class[name] = {"p": float(p[i]), "r": float(r[i]),
                               "ap50": float(ap50[i]),
                               "ap": float(ap_mean[i])}
    else:
        mp = mr = map50 = map75 = map_ = 0.0

    speed = (t_inf / max(n_img, 1) * 1e3, 0.0)
    if verbose:
        print(f"{'all':>10s} {n_img:10d} "
              f"P {mp:.3f} R {mr:.3f} mAP@.5 {map50:.3f} "
              f"mAP@.5:.95 {map_:.3f} ({speed[0]:.1f} ms/img)")
        for name, v in per_class.items():
            print(f"{name:>10s} P {v['p']:.3f} R {v['r']:.3f} "
                  f"AP50 {v['ap50']:.3f} AP {v['ap']:.3f}")
    return EvalResults(float(mp), float(mr), float(map50), float(map75),
                       float(map_), per_class, speed, nc)
