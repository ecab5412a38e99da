"""Bounding-box format conversion (PASCAL VOC / COCO / YOLO / Albumentations)
— public-knowledge coordinate math. Parity contract:
/root/reference/src/datachain/model/utils.py (same formats, 4-decimal
rounding, same validation errors)."""

from __future__ import annotations

from typing import Sequence

BBOX_FORMATS = ("albumentations", "coco", "voc", "yolo")


def validate_bbox(coords: Sequence[float], *types: type) -> None:
    """Reject non-sequences, wrong arity, and wrong element types."""
    if not isinstance(coords, (list, tuple)):
        raise TypeError(
            f"Invalid bounding box coordinates: {coords}, should be a list or tuple"
        )
    if len(coords) != 4:
        raise ValueError(
            f"Invalid bounding box coordinates: {coords}, should have 4 values"
        )
    if any(not isinstance(c, types) for c in coords):
        raise ValueError(
            f"Invalid bounding box coordinates: {coords}, should be {types}"
        )


def _to_voc(
    coords: Sequence[float], img_size: Sequence[int], source: str
) -> list[float]:
    """Any format -> VOC pixel corners [x1, y1, x2, y2] (floats)."""
    if source == "voc":
        return list(coords)
    if source == "coco":
        x, y, w, h = coords
        return [x, y, x + w, y + h]
    if source == "albumentations":
        w, h = img_size[0], img_size[1]
        return [coords[0] * w, coords[1] * h, coords[2] * w, coords[3] * h]
    if source == "yolo":
        w, h = img_size[0], img_size[1]
        cx, cy, bw, bh = coords[0] * w, coords[1] * h, coords[2] * w, coords[3] * h
        return [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2]
    raise ValueError(f"Unsupported source format: {source}")


def _from_voc(
    voc: Sequence[float], img_size: Sequence[int], target: str
) -> list[float]:
    """VOC pixel corners -> any format (floats)."""
    x1, y1, x2, y2 = voc
    if target == "voc":
        return [x1, y1, x2, y2]
    if target == "coco":
        return [x1, y1, x2 - x1, y2 - y1]
    if target == "albumentations":
        w, h = img_size[0], img_size[1]
        return [x1 / w, y1 / h, x2 / w, y2 / h]
    if target == "yolo":
        w, h = img_size[0], img_size[1]
        return [(x1 + x2) / 2 / w, (y1 + y2) / 2 / h, (x2 - x1) / w, (y2 - y1) / h]
    raise ValueError(f"Unsupported target format: {target}")


def convert_bbox(
    coords: Sequence[float],
    img_size: Sequence[int],
    source: str,
    target: str,
) -> list[float]:
    """Convert between bbox formats, rounding to 4 decimals.

    - albumentations: normalized [x_min, y_min, x_max, y_max]
    - coco: pixel [x_min, y_min, width, height]
    - voc: pixel [x_min, y_min, x_max, y_max]
    - yolo: normalized [x_center, y_center, width, height]

    ``img_size`` = [width, height]; required whenever source or target is a
    normalized format.
    """
    if source not in BBOX_FORMATS:
        raise ValueError(f"Unsupported source format: {source}")
    if target not in BBOX_FORMATS:
        raise ValueError(f"Unsupported target format: {target}")
    out = _from_voc(_to_voc(coords, img_size, source), img_size, target)
    return [round(c, 4) for c in out]
