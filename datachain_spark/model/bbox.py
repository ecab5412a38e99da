"""Bounding-box signal models. Parity contract:
/root/reference/src/datachain/model/bbox.py (BBox = PASCAL VOC integer
corners with from/to converters for COCO/YOLO/Albumentations; OBBox = 8
integer coords)."""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence, Union

from pydantic import Field

from ..schema import DataModel
from .utils import convert_bbox, validate_bbox

if TYPE_CHECKING:
    from .pose import Pose, Pose3D


class BBox(DataModel):
    """Axis-aligned bounding box stored as PASCAL VOC pixel corners
    [x1, y1, x2, y2] (ints), with a title label."""

    title: str = Field(default="")
    coords: list[int] = Field(default=[])

    # -- constructors per source format ------------------------------------

    @staticmethod
    def from_voc(coords: Sequence[float], title: str = "") -> "BBox":
        validate_bbox(coords, float, int)
        return BBox(title=title, coords=[round(c) for c in coords])

    @staticmethod
    def from_coco(coords: Sequence[float], title: str = "") -> "BBox":
        validate_bbox(coords, float, int)
        return BBox(
            title=title,
            coords=[round(c) for c in convert_bbox(coords, [], "coco", "voc")],
        )

    @staticmethod
    def from_albumentations(
        coords: Sequence[float], img_size: Sequence[int], title: str = ""
    ) -> "BBox":
        validate_bbox(coords, float)
        voc = convert_bbox(coords, img_size, "albumentations", "voc")
        return BBox(title=title, coords=[round(c) for c in voc])

    @staticmethod
    def from_yolo(
        coords: Sequence[float], img_size: Sequence[int], title: str = ""
    ) -> "BBox":
        validate_bbox(coords, float)
        voc = convert_bbox(coords, img_size, "yolo", "voc")
        return BBox(title=title, coords=[round(c) for c in voc])

    @staticmethod
    def from_list(coords: Sequence[float], title: str = "") -> "BBox":
        return BBox.from_voc(coords, title=title)

    @staticmethod
    def from_dict(coords: dict, title: str = "") -> "BBox":
        keys = ("x1", "y1", "x2", "y2")
        if not isinstance(coords, dict) or set(coords) != set(keys):
            raise ValueError("Bounding box must be a dictionary with coordinates.")
        return BBox.from_voc([coords[k] for k in keys], title=title)

    # -- exporters per target format ---------------------------------------

    def to_voc(self) -> list[int]:
        return self.coords

    def to_coco(self) -> list[int]:
        return [round(c) for c in convert_bbox(self.coords, [], "voc", "coco")]

    def to_albumentations(self, img_size: Sequence[int]) -> list[float]:
        return convert_bbox(self.coords, img_size, "voc", "albumentations")

    def to_yolo(self, img_size: Sequence[int]) -> list[float]:
        return convert_bbox(self.coords, img_size, "voc", "yolo")

    # -- geometry ----------------------------------------------------------

    def point_inside(self, x: int, y: int) -> bool:
        """True when (x, y) lies in the closed box (edges count as inside)."""
        x1, y1, x2, y2 = self.coords
        return x1 <= x <= x2 and y1 <= y <= y2

    def pose_inside(self, pose: Union["Pose", "Pose3D"]) -> bool:
        """True when every visible keypoint (x>0 or y>0) is inside."""
        return all(
            self.point_inside(x, y)
            for x, y in zip(pose.x, pose.y)
            if x > 0 or y > 0
        )


class OBBox(DataModel):
    """Oriented bounding box: four pixel corners [x1,y1,...,x4,y4] (ints)."""

    title: str = Field(default="")
    coords: list[int] = Field(default=[])

    @staticmethod
    def from_list(coords: Sequence[float], title: str = "") -> "OBBox":
        if not isinstance(coords, (list, tuple)):
            raise TypeError("Oriented bounding box must be a list of coordinates.")
        if len(coords) != 8:
            raise ValueError("Oriented bounding box must have 8 coordinates.")
        if not all(isinstance(v, (int, float)) for v in coords):
            raise ValueError(
                "Oriented bounding box coordinates must be floats or integers."
            )
        return OBBox(title=title, coords=[round(c) for c in coords])

    @staticmethod
    def from_dict(coords: dict, title: str = "") -> "OBBox":
        keys = ("x1", "y1", "x2", "y2", "x3", "y3", "x4", "y4")
        if not isinstance(coords, dict) or set(coords) != set(keys):
            raise ValueError(
                "Oriented bounding box must be a dictionary with coordinates."
            )
        return OBBox.from_list([coords[k] for k in keys], title=title)
