"""Hub-style model factory + input-robust inference wrapper.

Functional parity surface: reference ``hubconf.py:21-143`` (yolov5s..x
constructors, ``custom``) and ``autoShape``/``Detections``
(models/common.py:951-1129) — pass a filename / PIL image / numpy array /
array batch, get a Detections result with pandas-style records, render and
save helpers.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from mmidet_tpu.data.datasets import letterbox_np
from mmidet_tpu.models.detector import TwoStreamDetector
from mmidet_tpu.models.zoo import get_model_spec
from mmidet_tpu.ops.nms import non_max_suppression


class Detections:
    """Inference results container (ref common.py:1032-1129)."""

    def __init__(self, imgs, records, names):
        self.imgs = imgs
        self.records = records  # list per image of dicts
        self.names = names

    @property
    def n(self):
        return len(self.imgs)

    def pandas(self):
        """List of per-image record lists (pandas-free 'records' orient)."""
        return self.records

    def render(self):
        from mmidet_tpu.utils.plots import colors, plot_one_box
        out = []
        for img, recs in zip(self.imgs, self.records):
            ann = img.copy()
            for r in recs:
                ann = plot_one_box(
                    [r["xmin"], r["ymin"], r["xmax"], r["ymax"]], ann,
                    colors(r["class"]), f"{r['name']} {r['confidence']:.2f}")
            out.append(ann)
        return out

    def save(self, save_dir="runs/hub"):
        from PIL import Image
        os.makedirs(save_dir, exist_ok=True)
        paths = []
        for i, ann in enumerate(self.render()):
            p = os.path.join(save_dir, f"image{i}.jpg")
            Image.fromarray(ann).save(p)
            paths.append(p)
        return paths

    def crop(self, save_dir="runs/hub/crops", save=True):
        """Per-detection crops (ref Detections.crop, common.py:1100-1108):
        returns the crop arrays; writes them under <save_dir>/<class>/
        when ``save``."""
        from mmidet_tpu.utils.general import save_one_box
        crops = []
        for i, (img, recs) in enumerate(zip(self.imgs, self.records)):
            for k, r in enumerate(recs):
                path = os.path.join(save_dir, r["name"],
                                    f"image{i}_{k}.jpg")
                crops.append(save_one_box(
                    [r["xmin"], r["ymin"], r["xmax"], r["ymax"]], img,
                    path, save=save))
        return crops

    def tolist(self):
        """Per-image Detections list (ref Detections.tolist)."""
        return [Detections([img], [recs], self.names)
                for img, recs in zip(self.imgs, self.records)]

    def print(self):
        print(self.__repr__())

    def __repr__(self):
        return (f"Detections({self.n} images, "
                f"{sum(len(r) for r in self.records)} objects)")


class AutoShapeModel:
    """Input-robust wrapper: filename | PIL | numpy HWC | batch -> NMS'd
    detections in original coordinates (ref autoShape)."""

    def __init__(self, model, variables, names, img_size=640,
                 conf=0.25, iou=0.45, two_stream=False, augment=False):
        self.model = model
        self.variables = variables
        self.names = names
        self.img_size = img_size
        self.conf = conf
        self.iou = iou
        self.two_stream = two_stream
        self.augment = augment  # TTA (ref autoShape.forward(augment=...))

        import functools

        # augment/conf/iou are STATIC jit args (read at call time, below),
        # so flipping m.augment / m.conf after the first inference retraces
        # instead of being silently frozen into the first trace
        @functools.partial(jax.jit, static_argnums=(0, 1, 2))
        def infer(augment, conf, iou, variables, *imgs):
            def fwd(*ims):
                return model.apply(variables, *ims, train=False)["pred"]
            if augment:
                from mmidet_tpu.models.tta import forward_tta
                pred = forward_tta(fwd, imgs[0],
                                   imgs[1] if two_stream else None,
                                   gs=int(max(model.spec.strides)))
            else:
                pred = fwd(*imgs)
            return non_max_suppression(pred.astype(jnp.float32),
                                       conf_thres=conf, iou_thres=iou)
        self._infer = lambda *imgs: infer(bool(self.augment),
                                          float(self.conf), float(self.iou),
                                          self.variables, *imgs)

    @staticmethod
    def _to_numpy(im):
        from PIL import Image
        if isinstance(im, str):
            return np.asarray(Image.open(im).convert("RGB"))
        if hasattr(im, "convert"):  # PIL
            return np.asarray(im.convert("RGB"))
        im = np.asarray(im)
        if im.ndim == 3 and im.shape[0] in (1, 3) and im.shape[0] < im.shape[-1]:
            im = im.transpose(1, 2, 0)  # CHW -> HWC
        if im.ndim == 2:
            im = np.tile(im[..., None], 3)
        return im[..., :3]

    def __call__(self, imgs, imgs2=None):
        single = not isinstance(imgs, (list, tuple))
        imgs = [imgs] if single else list(imgs)
        imgs = [self._to_numpy(im) for im in imgs]
        if self.two_stream:
            imgs2 = [imgs2] if not isinstance(imgs2, (list, tuple)) else \
                list(imgs2)
            imgs2 = [self._to_numpy(im) for im in imgs2]
        else:
            imgs2 = imgs

        s = self.img_size
        lb, meta = [], []
        lb2 = []
        for im, im2 in zip(imgs, imgs2):
            out, r, (dw, dh) = letterbox_np(im, (s, s))
            out2, _, _ = letterbox_np(im2, (s, s))
            lb.append(out)
            lb2.append(out2)
            meta.append((r, dw, dh, im.shape[:2]))
        x = jnp.asarray(np.stack(lb), jnp.float32) / 255.0
        x2 = jnp.asarray(np.stack(lb2), jnp.float32) / 255.0
        args = (x, x2) if self.two_stream else (x,)
        dets, valid = self._infer(*args)
        dets = np.asarray(dets)
        valid = np.asarray(valid)
        records = []
        for i, (r, dw, dh, (h0, w0)) in enumerate(meta):
            d = dets[i][valid[i]]
            recs = []
            for x1, y1, x2_, y2, conf, cls in d:
                recs.append({
                    "xmin": float(np.clip((x1 - dw) / r, 0, w0)),
                    "ymin": float(np.clip((y1 - dh) / r, 0, h0)),
                    "xmax": float(np.clip((x2_ - dw) / r, 0, w0)),
                    "ymax": float(np.clip((y2 - dh) / r, 0, h0)),
                    "confidence": float(conf), "class": int(cls),
                    "name": self.names[int(cls)]})
            records.append(recs)
        return Detections(imgs, records, self.names)


def _make(name: str, nc: int = 80, variables=None, names=None,
          img_size: int = 640, dtype=jnp.bfloat16, conf: float = 0.25,
          iou: float = 0.45, augment: bool = False):
    spec = get_model_spec(name, nc=nc)
    two_stream = "_" in name
    model = TwoStreamDetector(spec=spec, use_cem=two_stream,
                              aux_mode="off", dtype=dtype)
    if variables is None:
        small = jnp.zeros((1, 64, 64, 3), jnp.float32)
        args = (small, small) if two_stream else (small,)
        variables = model.init({"params": jax.random.PRNGKey(0)}, *args,
                               train=False)
    names = names or [str(i) for i in range(nc)]
    return AutoShapeModel(model, variables, names, img_size, conf=conf,
                          iou=iou, two_stream=two_stream, augment=augment)


def yolov5s(nc: int = 80, **kw):
    return _make("yolov5s", nc, **kw)


def yolov5m(nc: int = 80, **kw):
    return _make("yolov5m", nc, **kw)


def yolov5l(nc: int = 80, **kw):
    return _make("yolov5l", nc, **kw)


def yolov5x(nc: int = 80, **kw):
    return _make("yolov5x", nc, **kw)


def yolov5s6(nc: int = 80, **kw):
    return _make("yolov5s6", nc, **kw)


def yolov5m6(nc: int = 80, **kw):
    return _make("yolov5m6", nc, **kw)


def yolov5l6(nc: int = 80, **kw):
    return _make("yolov5l6", nc, **kw)


def yolov5x6(nc: int = 80, **kw):
    return _make("yolov5x6", nc, **kw)


def mmidet(nc: int = 6, scale: str = "l", fusion: str = "fuse3_fourier",
           **kw):
    """The two-stream flagship constructor."""
    return _make(f"yolov5{scale}_{fusion}", nc, **kw)


def custom(deploy_bundle: str, conf: float = 0.25, iou: float = 0.45,
           augment: bool = False):
    """Load from a deploy bundle dir (ref hubconf.custom)."""
    from mmidet_tpu.deploy.export import load_deploy_bundle
    from mmidet_tpu.models.spec import is_two_stream
    spec, variables, meta = load_deploy_bundle(deploy_bundle)
    two_stream = is_two_stream(spec)
    model = TwoStreamDetector(spec=spec, use_cem=two_stream,
                              aux_mode="off", dtype=jnp.bfloat16)
    return AutoShapeModel(model, variables, meta["names"],
                          meta.get("img_size", 640), conf=conf, iou=iou,
                          two_stream=two_stream, augment=augment)
