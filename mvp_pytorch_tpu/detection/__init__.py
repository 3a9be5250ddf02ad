"""TPU-native detection / RoI front-end.

Replaces the reference's opaque TorchScript VinVL artifact
(`/root/reference/tools/img_feat_extract.py:71-74`,
`oscar/modeling/modeling_pipeline.py:32`) behind the same contract:
raw image -> (boxes, tags, 2048-d RoI features) -> 2054-d region features
(2048 + normalized [x1,y1,x2,y2,w,h]).

Everything is JAX/XLA with static shapes: fixed input canvas, fixed
pre-NMS top-K, fixed max_regions with a validity mask. See detector.py.
"""

from .detector import DetectorConfig, JaxDetector
from .frontend import JaxDetectionFrontend, load_frontend, save_detector
from .nms import batched_nms, box_iou
from .roi_align import roi_align

__all__ = [
    "DetectorConfig", "JaxDetector", "JaxDetectionFrontend",
    "load_frontend", "save_detector", "batched_nms", "box_iou", "roi_align",
]
