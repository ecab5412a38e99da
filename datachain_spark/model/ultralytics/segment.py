"""YOLO segmentation-result models. Parity contract:
/root/reference/src/datachain/model/ultralytics/segment.py."""

from __future__ import annotations

from pydantic import Field

from ...schema import DataModel
from ..bbox import BBox
from ..segment import Segment
from .bbox import _summaries


class YoloSegment(DataModel):
    """One detected segment: box + polygon contour."""

    cls: int = Field(default=-1)
    name: str = Field(default="")
    confidence: float = Field(default=0)
    box: BBox = Field(default=BBox())
    segment: Segment = Field(default=Segment())

    @staticmethod
    def from_result(result) -> "YoloSegment":
        summary = result.summary()
        if not summary:
            return YoloSegment(box=BBox(), segment=Segment())
        s = summary[0]
        name = s.get("name", "")
        box = BBox.from_dict(s["box"], title=name) if s.get("box") else BBox()
        seg = (
            Segment.from_dict(s["segments"], title=name)
            if s.get("segments")
            else Segment()
        )
        return YoloSegment(
            cls=s["class"], name=name, confidence=s["confidence"],
            box=box, segment=seg,
        )


class YoloSegments(DataModel):
    """All detected segments of a result batch, column-wise."""

    cls: list[int] = Field(default=[])
    name: list[str] = Field(default=[])
    confidence: list[float] = Field(default=[])
    box: list[BBox] = Field(default=[])
    segment: list[Segment] = Field(default=[])

    @staticmethod
    def from_results(results) -> "YoloSegments":
        out = YoloSegments()
        for s in _summaries(results):
            name = s.get("name", "")
            out.cls.append(s["class"])
            out.name.append(name)
            out.confidence.append(s["confidence"])
            if s.get("box"):
                out.box.append(BBox.from_dict(s["box"], title=name))
            if s.get("segments"):
                out.segment.append(Segment.from_dict(s["segments"], title=name))
        return out
