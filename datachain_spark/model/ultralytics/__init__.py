"""YOLO-result signal models (You Only Look Once detector family).

Converters consume only the plain-dict output of ultralytics'
``Results.summary()`` — no ultralytics import is required, so these work
with any object exposing that contract (including test fakes). Parity:
/root/reference/src/datachain/model/ultralytics/."""

from .bbox import YoloBBox, YoloBBoxes, YoloOBBox, YoloOBBoxes
from .pose import YoloPose, YoloPoses
from .segment import YoloSegment, YoloSegments

__all__ = [
    "YoloBBox",
    "YoloBBoxes",
    "YoloOBBox",
    "YoloOBBoxes",
    "YoloPose",
    "YoloPoses",
    "YoloSegment",
    "YoloSegments",
]
