"""YOLO detection-result models. Parity contract:
/root/reference/src/datachain/model/ultralytics/bbox.py (built from
``Results.summary()`` dicts: class/name/confidence/box)."""

from __future__ import annotations

from pydantic import Field

from ...schema import DataModel
from ..bbox import BBox, OBBox


def _summaries(results) -> list[dict]:
    out = []
    for r in results:
        out.extend(r.summary())
    return out


class YoloBBox(DataModel):
    """One detected box: class id, label, confidence, VOC-pixel box."""

    cls: int = Field(default=-1)
    name: str = Field(default="")
    confidence: float = Field(default=0)
    box: BBox = Field(default=BBox())

    @staticmethod
    def from_result(result) -> "YoloBBox":
        summary = result.summary()
        if not summary:
            return YoloBBox(box=BBox())
        s = summary[0]
        name = s.get("name", "")
        box = BBox.from_dict(s["box"], title=name) if s.get("box") else BBox()
        return YoloBBox(
            cls=s["class"], name=name, confidence=s["confidence"], box=box
        )


class YoloBBoxes(DataModel):
    """All detected boxes of a result batch, column-wise."""

    cls: list[int] = Field(default=[])
    name: list[str] = Field(default=[])
    confidence: list[float] = Field(default=[])
    box: list[BBox] = Field(default=[])

    @staticmethod
    def from_results(results) -> "YoloBBoxes":
        out = YoloBBoxes()
        for s in _summaries(results):
            name = s.get("name", "")
            out.cls.append(s["class"])
            out.name.append(name)
            out.confidence.append(s["confidence"])
            if s.get("box"):
                out.box.append(BBox.from_dict(s["box"], title=name))
        return out


class YoloOBBox(DataModel):
    """One oriented detected box."""

    cls: int = Field(default=-1)
    name: str = Field(default="")
    confidence: float = Field(default=0)
    box: OBBox = Field(default=OBBox())

    @staticmethod
    def from_result(result) -> "YoloOBBox":
        summary = result.summary()
        if not summary:
            return YoloOBBox(box=OBBox())
        s = summary[0]
        name = s.get("name", "")
        box = OBBox.from_dict(s["box"], title=name) if s.get("box") else OBBox()
        return YoloOBBox(
            cls=s["class"], name=name, confidence=s["confidence"], box=box
        )


class YoloOBBoxes(DataModel):
    """All oriented boxes of a result batch, column-wise."""

    cls: list[int] = Field(default=[])
    name: list[str] = Field(default=[])
    confidence: list[float] = Field(default=[])
    box: list[OBBox] = Field(default=[])

    @staticmethod
    def from_results(results) -> "YoloOBBoxes":
        out = YoloOBBoxes()
        for s in _summaries(results):
            name = s.get("name", "")
            out.cls.append(s["class"])
            out.name.append(name)
            out.confidence.append(s["confidence"])
            if s.get("box"):
                out.box.append(OBBox.from_dict(s["box"], title=name))
        return out
