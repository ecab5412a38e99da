"""YOLO pose-result models. Parity contract:
/root/reference/src/datachain/model/ultralytics/pose.py."""

from __future__ import annotations

from pydantic import Field

from ...schema import DataModel
from ..bbox import BBox
from ..pose import Pose3D
from .bbox import _summaries


class YoloPoseBodyPart:
    """COCO-17 keypoint index names."""

    nose = 0
    left_eye = 1
    right_eye = 2
    left_ear = 3
    right_ear = 4
    left_shoulder = 5
    right_shoulder = 6
    left_elbow = 7
    right_elbow = 8
    left_wrist = 9
    right_wrist = 10
    left_hip = 11
    right_hip = 12
    left_knee = 13
    right_knee = 14
    left_ankle = 15
    right_ankle = 16


class YoloPose(DataModel):
    """One detected pose: box + 17 keypoints with visibility."""

    cls: int = Field(default=-1)
    name: str = Field(default="")
    confidence: float = Field(default=0)
    box: BBox = Field(default=BBox())
    pose: Pose3D = Field(default=Pose3D())

    @staticmethod
    def from_result(result) -> "YoloPose":
        summary = result.summary()
        if not summary:
            return YoloPose(box=BBox(), pose=Pose3D())
        s = summary[0]
        name = s.get("name", "")
        box = BBox.from_dict(s["box"], title=name) if s.get("box") else BBox()
        pose = Pose3D.from_dict(s["keypoints"]) if s.get("keypoints") else Pose3D()
        return YoloPose(
            cls=s["class"], name=name, confidence=s["confidence"], box=box, pose=pose
        )


class YoloPoses(DataModel):
    """All detected poses of a result batch, column-wise."""

    cls: list[int] = Field(default=[])
    name: list[str] = Field(default=[])
    confidence: list[float] = Field(default=[])
    box: list[BBox] = Field(default=[])
    pose: list[Pose3D] = Field(default=[])

    @staticmethod
    def from_results(results) -> "YoloPoses":
        out = YoloPoses()
        for s in _summaries(results):
            name = s.get("name", "")
            out.cls.append(s["class"])
            out.name.append(name)
            out.confidence.append(s["confidence"])
            if s.get("box"):
                out.box.append(BBox.from_dict(s["box"], title=name))
            if s.get("keypoints"):
                out.pose.append(Pose3D.from_dict(s["keypoints"]))
        return out
