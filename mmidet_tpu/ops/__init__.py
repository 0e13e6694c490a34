from mmidet_tpu.ops.boxes import (
    xyxy2xywh,
    xywh2xyxy,
    xywhn2xyxy,
    bbox_iou,
    box_iou,
    wh_iou,
    scale_coords,
    clip_coords,
)
from mmidet_tpu.ops.nms import non_max_suppression

__all__ = [
    "xyxy2xywh",
    "xywh2xyxy",
    "xywhn2xyxy",
    "bbox_iou",
    "box_iou",
    "wh_iou",
    "scale_coords",
    "clip_coords",
    "non_max_suppression",
]
