"""Pose keypoint signal models (17-point COCO skeleton). Parity contract:
/root/reference/src/datachain/model/pose.py."""

from __future__ import annotations

from typing import Sequence

from pydantic import Field

from ..schema import DataModel


def _check_xy(points, arity: int, what: str) -> None:
    if not isinstance(points, (list, tuple)):
        raise TypeError(f"{what} must be a list of coordinates.")
    if len(points) != arity:
        parts = {2: "2 lists: x and y coordinates",
                 3: "3 lists: x, y coordinates and visible"}[arity]
        raise ValueError(f"{what} must be a list of {parts}.")
    for p in points:
        if not isinstance(p, (list, tuple)):
            raise TypeError(f"{what} coordinate groups must be lists.")
    if not all(isinstance(v, (int, float)) for grp in points for v in grp):
        raise ValueError(f"{what} coordinates must be floats or integers.")


class Pose(DataModel):
    """2D keypoints: parallel x/y lists, one entry per body part."""

    x: list[int] = Field(default=[])
    y: list[int] = Field(default=[])

    @staticmethod
    def from_list(points: Sequence[Sequence[float]]) -> "Pose":
        _check_xy(points, 2, "Pose")
        xs, ys = points
        if len(xs) != len(ys) != 17:
            raise ValueError(
                "Pose x and y coordinates must have the same length of 17."
            )
        return Pose(x=[round(v) for v in xs], y=[round(v) for v in ys])

    @staticmethod
    def from_dict(points: dict) -> "Pose":
        if not isinstance(points, dict) or set(points) != {"x", "y"}:
            raise ValueError("Pose must be a dictionary with coordinates.")
        return Pose.from_list([points["x"], points["y"]])


class Pose3D(DataModel):
    """Keypoints with per-point visibility scores."""

    x: list[int] = Field(default=[])
    y: list[int] = Field(default=[])
    visible: list[float] = Field(default=[])

    @staticmethod
    def from_list(points: Sequence[Sequence[float]]) -> "Pose3D":
        _check_xy(points, 3, "Pose3D")
        xs, ys, vis = points
        if len(xs) != len(ys) != len(vis) != 17:
            raise ValueError("Pose3D x, y and visible must have the same length of 17.")
        return Pose3D(
            x=[round(v) for v in xs],
            y=[round(v) for v in ys],
            visible=list(vis),
        )

    @staticmethod
    def from_dict(points: dict) -> "Pose3D":
        if not isinstance(points, dict) or set(points) != {"x", "y", "visible"}:
            raise ValueError("Pose3D must be a dictionary with coordinates.")
        return Pose3D.from_list([points["x"], points["y"], points["visible"]])
