"""Segmentation-contour signal model. Parity contract:
/root/reference/src/datachain/model/segment.py."""

from __future__ import annotations

from typing import Sequence

from pydantic import Field

from ..schema import DataModel


class Segment(DataModel):
    """Polygon contour as parallel x/y pixel lists, with a title label."""

    title: str = Field(default="")
    x: list[int] = Field(default=[])
    y: list[int] = Field(default=[])

    @staticmethod
    def from_list(points: Sequence[Sequence[float]], title: str = "") -> "Segment":
        if not isinstance(points, (list, tuple)):
            raise TypeError("Segment must be a list of coordinates.")
        if len(points) != 2:
            raise ValueError("Segment must be a list of 2 lists: x and y coordinates.")
        xs, ys = points
        if not isinstance(xs, (list, tuple)) or not isinstance(ys, (list, tuple)):
            raise TypeError("Segment x and y coordinates must be lists.")
        if len(xs) != len(ys):
            raise ValueError("Segment x and y coordinates must have the same length.")
        if not all(isinstance(v, (int, float)) for v in [*xs, *ys]):
            raise ValueError("Segment coordinates must be floats or integers.")
        return Segment(
            title=title, x=[round(v) for v in xs], y=[round(v) for v in ys]
        )

    @staticmethod
    def from_dict(points: dict, title: str = "") -> "Segment":
        if not isinstance(points, dict) or set(points) != {"x", "y"}:
            raise ValueError("Segment must be a dictionary with coordinates.")
        return Segment.from_list([points["x"], points["y"]], title=title)
