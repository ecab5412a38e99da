"""Computer-vision signal models (bounding boxes, poses, segments) and
YOLO-result converters. Parity: /root/reference/src/datachain/model/."""

from . import ultralytics
from .bbox import BBox, OBBox
from .pose import Pose, Pose3D
from .segment import Segment

__all__ = ["BBox", "OBBox", "Pose", "Pose3D", "Segment", "ultralytics"]
