"""Batched host->device loaders with fixed shapes and background prefetch.

Replaces the reference's torch ``InfiniteDataLoader`` / ``DistributedSampler``
machinery (``utils/datasets.py:41-76,225-295``).  Batches are dicts of numpy
arrays with *static* shapes — images letterboxed to the train size, labels
padded to ``max_labels`` with a validity mask — so a single XLA program
serves every step.  A double-buffered background thread overlaps host decode
with device compute (the reference's worker-process pool, minus the
processes)."""

from __future__ import annotations

import queue
import threading

import numpy as np

from mmidet_tpu.data.datasets import PairedDataset, letterbox_np


def _load_image_scale(img: np.ndarray, img_size: int,
                      augment: bool) -> np.ndarray:
    """Stage-1 content resize: longest side -> ``img_size`` (up AND down;
    ref load_image / load_image_rgb_ir, datasets.py:1648-1654: INTER_AREA
    when shrinking at val time, INTER_LINEAR otherwise).  The reference
    ALWAYS applies this before letterboxing, so eval content is at
    img_size scale even when the rect batch canvas is larger."""
    h0, w0 = img.shape[:2]
    r = img_size / max(h0, w0)
    if r == 1:
        return img
    new_wh = (int(w0 * r), int(h0 * r))
    try:
        import cv2
        interp = cv2.INTER_AREA if (r < 1 and not augment) \
            else cv2.INTER_LINEAR
        return cv2.resize(img, new_wh, interpolation=interp)
    except ImportError:
        from PIL import Image
        return np.asarray(Image.fromarray(img).resize(new_wh,
                                                      Image.BILINEAR))


def collate_paired(samples: list[dict], img_size: int = 640,
                   max_labels: int = 120, shape_hw=None,
                   scaleup: bool = True) -> dict:
    """Two-stage resize exactly as the reference eval/train pipeline
    (datasets.py:1478-1496): (1) content to ``img_size`` scale
    (``_load_image_scale``), (2) letterbox pad into the batch canvas —
    square ``img_size`` or the rect ``shape_hw``.  Labels scaled to the
    padded frame; padded to (B, max_labels, 5) + mask.  ``scaleup=False``
    is the reference's VAL-time letterbox behavior (scaleup=self.augment,
    datasets.py:1484-1487: 'only scale down ... for better test mAP').

    ``shapes`` carries the reference's COCO-rescaling convention
    ((h0, w0), ((h1/h0, w1/w0)[0] as gain, pad)) — the stage-1 ratio, with
    any further letterbox ratio folded in (the rect shapes always cover
    the stage-1 extents, so that extra ratio is 1 in practice)."""
    bsz = len(samples)
    th, tw = shape_hw if shape_hw is not None else (img_size, img_size)
    rgb = np.empty((bsz, th, tw, 3), np.uint8)
    ir = np.empty((bsz, th, tw, 3), np.uint8)
    targets = np.zeros((bsz, max_labels, 5), np.float32)
    mask = np.zeros((bsz, max_labels), bool)
    shapes = []
    for i, s in enumerate(samples):
        h0, w0 = s["shape"]
        im_r = _load_image_scale(s["rgb"], img_size, augment=scaleup)
        im_i = _load_image_scale(s["ir"], img_size, augment=scaleup)
        h1 = im_r.shape[0]
        out_r, r2, (dw, dh) = letterbox_np(im_r, (th, tw), scaleup=scaleup)
        out_i, _, _ = letterbox_np(im_i, (th, tw), scaleup=scaleup)
        rgb[i], ir[i] = out_r, out_i
        lab = s["labels"]
        n = min(len(lab), max_labels)
        if n:
            l = lab[:n].copy()
            # normalized in original frame -> normalized in padded frame;
            # nw/nh are the ROUNDED final content extents (what letterbox
            # actually produced, = canvas - 2*pad) so labels match the
            # pixels exactly and the PIL and native collates agree
            # bit-for-bit
            nw, nh = tw - 2.0 * dw, th - 2.0 * dh
            l[:, 1] = (l[:, 1] * nw + dw) / tw
            l[:, 2] = (l[:, 2] * nh + dh) / th
            l[:, 3] = l[:, 3] * nw / tw
            l[:, 4] = l[:, 4] * nh / th
            targets[i, :n] = l
            mask[i, :n] = True
        shapes.append((s["shape"], (h1 * r2 / h0, (dw, dh))))
    return {"rgb": rgb, "ir": ir, "targets": targets, "mask": mask,
            "shapes": shapes,
            "files": [s.get("rgb_file", "") for s in samples]}


def collate_mosaic_pool(samples4: list[list[dict]], img_size: int,
                        max_labels_tile: int = 60) -> dict:
    """Collate B groups of 4 samples into the mosaic-augmentation input
    format: rgb4/ir4 (B,4,s,s,3) uint8 letterboxed tiles + labels4
    (B,4,T,5) + mask4 (reference picks self + 3 random images,
    datasets.py:1764)."""
    bsz = len(samples4)
    s = img_size
    rgb4 = np.empty((bsz, 4, s, s, 3), np.uint8)
    ir4 = np.empty((bsz, 4, s, s, 3), np.uint8)
    labels4 = np.zeros((bsz, 4, max_labels_tile, 5), np.float32)
    mask4 = np.zeros((bsz, 4, max_labels_tile), bool)
    # [top, left, nh, nw] content placement inside each letterboxed tile —
    # lets the device mosaic anchor CONTENT corners at the center, exactly
    # as the reference's aspect-shaped placement (datasets.py:1780-1795)
    pads4 = np.zeros((bsz, 4, 4), np.float32)
    for b, group in enumerate(samples4):
        for t, smp in enumerate(group):
            out_r, r, (dw, dh) = letterbox_np(smp["rgb"], (s, s))
            out_i, _, _ = letterbox_np(smp["ir"], (s, s))
            rgb4[b, t], ir4[b, t] = out_r, out_i
            pads4[b, t] = (int(round(dh - 0.1)), int(round(dw - 0.1)),
                           int(round(s - 2 * dh)), int(round(s - 2 * dw)))
            lab = smp["labels"]
            n = min(len(lab), max_labels_tile)
            if n:
                l = lab[:n].copy()
                nw, nh = s - 2.0 * dw, s - 2.0 * dh  # rounded extents
                l[:, 1] = (l[:, 1] * nw + dw) / s
                l[:, 2] = (l[:, 2] * nh + dh) / s
                l[:, 3] = l[:, 3] * nw / s
                l[:, 4] = l[:, 4] * nh / s
                labels4[b, t, :n] = l
                mask4[b, t, :n] = True
    return {"rgb4": rgb4, "ir4": ir4, "labels4": labels4, "mask4": mask4,
            "pads4": pads4}


def collate_mosaic_pool_native(ds: PairedDataset, groups_idx,
                               img_size: int,
                               max_labels_tile: int = 60) -> dict:
    """Native-fastloader mosaic collate: ONE C call decodes + letterboxes
    all 4*B tiles per modality (threaded libjpeg/libpng, no GIL, no PIL).
    Label geometry is recovered from the returned (r, dw, dh) letterbox
    meta — exactly the same numbers collate_mosaic_pool computes — so no
    header reads are needed either."""
    from mmidet_tpu.data.native import batch_decode_letterbox
    s = img_size
    bsz = len(groups_idx)
    flat = [j for g in groups_idx for j in g]
    rgb, meta = batch_decode_letterbox([ds.rgb_files[j] for j in flat], s)
    ir, _ = batch_decode_letterbox([ds.ir_files[j] for j in flat], s)
    rgb4 = rgb.reshape(bsz, 4, s, s, 3)
    ir4 = ir.reshape(bsz, 4, s, s, 3)
    labels4 = np.zeros((bsz, 4, max_labels_tile, 5), np.float32)
    mask4 = np.zeros((bsz, 4, max_labels_tile), bool)
    pads4 = np.zeros((bsz, 4, 4), np.float32)
    for k, j in enumerate(flat):
        b, t = divmod(k, 4)
        r, dw, dh = meta[k]
        pads4[b, t] = (int(round(dh - 0.1)), int(round(dw - 0.1)),
                       int(round(s - 2 * dh)), int(round(s - 2 * dw)))
        lab = ds.labels[j]
        n = min(len(lab), max_labels_tile)
        if not n:
            continue
        nw, nh = s - 2.0 * dw, s - 2.0 * dh   # = round(w0*r), round(h0*r)
        l = lab[:n].copy()
        l[:, 1] = (l[:, 1] * nw + dw) / s
        l[:, 2] = (l[:, 2] * nh + dh) / s
        l[:, 3] = l[:, 3] * nw / s
        l[:, 4] = l[:, 4] * nh / s
        labels4[b, t, :n] = l
        mask4[b, t, :n] = True
    return {"rgb4": rgb4, "ir4": ir4, "labels4": labels4, "mask4": mask4,
            "pads4": pads4}


class MosaicLoader:
    """Training loader yielding mosaic-pool batches (4 tiles per sample:
    the indexed image + 3 uniformly random ones, as the reference).

    ``use_native=True`` (default: auto-detect) batches all tile decodes
    through the C++ fastloader — one call per modality per batch."""

    def __init__(self, dataset: PairedDataset, batch_size: int,
                 img_size: int = 640, max_labels_tile: int = 60,
                 seed: int = 0, prefetch: int = 2,
                 use_native: bool | None = None):
        from mmidet_tpu.data import native as _native
        self.ds = dataset
        self.batch_size = batch_size
        self.img_size = img_size
        self.max_labels_tile = max_labels_tile
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0
        self.image_weights = None  # optional (N,) sampling weights
        if use_native is None:
            use_native = (_native.available()
                          and not getattr(dataset, 'cache_images', False))
        self.use_native = use_native

    def __len__(self):
        return len(self.ds) // self.batch_size

    def set_image_weights(self, weights):
        """Per-image sampling weights (reference --image-weights,
        train.py:715-727): next epoch resamples base indices ~ weights."""
        w = np.asarray(weights, np.float64)
        self.image_weights = w / w.sum()

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        self.epoch += 1
        if self.image_weights is not None:
            idx = rng.choice(len(self.ds), size=len(self.ds),
                             p=self.image_weights)
        else:
            idx = rng.permutation(len(self.ds))
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def worker():
            try:
                for b in range(nb):
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    # companions sample UNIFORMLY even under
                    # --image-weights: the two-stream reference draws them
                    # from self.indices_rgb = range(n) (datasets.py:1223,
                    # 1794), which the train loop's weighted resample
                    # never touches (only base indices are reweighted)
                    groups_idx = [[int(i)] + [int(x) for x in
                                  rng.integers(0, len(self.ds), 3)]
                                  for i in sel]
                    if self.use_native:
                        q.put(collate_mosaic_pool_native(
                            self.ds, groups_idx, self.img_size,
                            self.max_labels_tile))
                    else:
                        groups = [[self.ds[j] for j in g]
                                  for g in groups_idx]
                        q.put(collate_mosaic_pool(groups, self.img_size,
                                                  self.max_labels_tile))
                q.put(None)
            except BaseException as e:  # propagate instead of deadlocking
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


class RectLoader:
    """Aspect-bucketed evaluation loader (reference ``rect=True, pad=0.5``,
    datasets.py:1160-1190): images sorted by aspect ratio; each batch gets a
    stride-aligned rectangular shape covering its members, minimizing pad
    pixels.  Produces a handful of distinct static shapes (one XLA compile
    per shape)."""

    def __init__(self, dataset: PairedDataset, batch_size: int,
                 img_size: int = 640, max_labels: int = 120,
                 stride: int = 32, pad: float = 0.5,
                 scaleup: bool = False):
        # scaleup=False is the reference EVAL default (letterbox
        # scaleup=self.augment); rect-TRAIN passes True
        self.scaleup = scaleup
        self.ds = dataset
        self.batch_size = batch_size
        self.img_size = img_size
        self.max_labels = max_labels
        from PIL import Image
        ars = []
        for p in dataset.rgb_files:
            with Image.open(p) as im:
                w, h = im.size
            ars.append(h / w)
        self.order = np.argsort(ars)
        self.shapes = []
        n = len(dataset)
        nb = (n + batch_size - 1) // batch_size
        for b in range(nb):
            sel = self.order[b * batch_size:(b + 1) * batch_size]
            batch_ars = [ars[i] for i in sel]
            mi, ma = min(batch_ars), max(batch_ars)
            shape = [1.0, 1.0]
            if ma < 1:
                shape = [ma, 1.0]
            elif mi > 1:
                shape = [1.0, 1.0 / mi]
            th = int(np.ceil(shape[0] * img_size / stride + pad)) * stride
            tw = int(np.ceil(shape[1] * img_size / stride + pad)) * stride
            self.shapes.append((min(th, img_size + stride),
                                min(tw, img_size + stride)))

    def __len__(self):
        return len(self.shapes)

    def __iter__(self):
        for b, shape_hw in enumerate(self.shapes):
            sel = self.order[b * self.batch_size:(b + 1) * self.batch_size]
            samples = [self.ds[int(i)] for i in sel]
            yield collate_paired(samples, self.img_size, self.max_labels,
                                 shape_hw=shape_hw, scaleup=self.scaleup)


class PairedLoader:
    """Iterates collated batches; optional shuffle; drops the last partial
    batch in training (fixed shapes).

    ``use_native=True`` routes image decode+letterbox through the C++
    fastloader (std::thread pool, one call per batch) — matching cv2's
    non-antialiased bilinear closer than the PIL fallback does."""

    def __init__(self, dataset: PairedDataset, batch_size: int,
                 img_size: int = 640, max_labels: int = 120,
                 shuffle: bool = False, drop_last: bool = True,
                 seed: int = 0, prefetch: int = 2,
                 use_native: bool | None = None, scaleup: bool = True):
        from mmidet_tpu.data import native as _native
        if use_native is None:
            use_native = (_native.available()
                          and not getattr(dataset, 'cache_images', False))
        self.use_native = use_native
        self.scaleup = scaleup  # False = reference val-time letterbox
        self.image_weights = None  # optional (N,) sampling weights
        self.ds = dataset
        self.batch_size = batch_size
        self.img_size = img_size
        self.max_labels = max_labels
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size

    def set_image_weights(self, weights):
        """Per-image sampling weights (reference --image-weights,
        train.py:715-727): next epoch resamples indices ~ weights."""
        w = np.asarray(weights, np.float64)
        self.image_weights = w / w.sum()

    def _indices(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        if self.image_weights is not None:
            return rng.choice(len(self.ds), size=len(self.ds),
                              p=self.image_weights)
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(idx)
        return idx

    def _collate_native(self, sel):
        """Batch decode+letterbox both modalities in one native call each."""
        from PIL import Image
        from mmidet_tpu.data.native import batch_decode_letterbox
        rgb_paths = [self.ds.rgb_files[int(i)] for i in sel]
        ir_paths = [self.ds.ir_files[int(i)] for i in sel]
        rgb, meta = batch_decode_letterbox(rgb_paths, self.img_size,
                                           scaleup=self.scaleup)
        ir, _ = batch_decode_letterbox(ir_paths, self.img_size,
                                       scaleup=self.scaleup)
        bsz = len(sel)
        targets = np.zeros((bsz, self.max_labels, 5), np.float32)
        mask = np.zeros((bsz, self.max_labels), bool)
        shapes = []
        s_ = self.img_size
        for i, ds_i in enumerate(sel):
            lab = self.ds.labels[int(ds_i)]
            r, dw, dh = meta[i]
            # recover original shape from the letterbox ratio
            with Image.open(rgb_paths[i]) as im:
                w0, h0 = im.size
            n = min(len(lab), self.max_labels)
            if n:
                l = lab[:n].copy()
                l[:, 1] = (l[:, 1] * w0 * r + dw) / s_
                l[:, 2] = (l[:, 2] * h0 * r + dh) / s_
                l[:, 3] = l[:, 3] * w0 * r / s_
                l[:, 4] = l[:, 4] * h0 * r / s_
                targets[i, :n] = l
                mask[i, :n] = True
            shapes.append(((h0, w0), (r, (dw, dh))))
        return {"rgb": rgb, "ir": ir, "targets": targets, "mask": mask,
                "shapes": shapes, "files": rgb_paths}

    def __iter__(self):
        idx = self._indices()
        self.epoch += 1
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def worker():
            try:
                for b in range(nb):
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    if self.use_native:
                        q.put(self._collate_native(sel))
                    else:
                        samples = [self.ds[int(i)] for i in sel]
                        q.put(collate_paired(samples, self.img_size,
                                             self.max_labels,
                                             scaleup=self.scaleup))
                q.put(None)
            except BaseException as e:  # propagate instead of deadlocking
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
