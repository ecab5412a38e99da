"""CV signal models: bbox conversions, pose/segment validation, YOLO-result
converters (fed by Results.summary()-shaped fakes), and chain integration."""

import pytest

from datachain_spark.model import BBox, OBBox, Pose, Pose3D, Segment
from datachain_spark.model.ultralytics import (
    YoloBBox,
    YoloBBoxes,
    YoloPose,
    YoloSegment,
)
from datachain_spark.model.utils import convert_bbox, validate_bbox


def test_bbox_format_conversions():
    # 100x200 image; voc corners (10, 20) .. (50, 120)
    voc = [10, 20, 50, 120]
    b = BBox.from_voc(voc, title="cat")
    assert b.coords == voc and b.title == "cat"
    assert b.to_coco() == [10, 20, 40, 100]
    assert b.to_albumentations([100, 200]) == [0.1, 0.1, 0.5, 0.6]
    assert b.to_yolo([100, 200]) == [0.3, 0.35, 0.4, 0.5]
    # and back from each format
    assert BBox.from_coco([10, 20, 40, 100]).coords == voc
    assert BBox.from_albumentations([0.1, 0.1, 0.5, 0.6], [100, 200]).coords == voc
    assert BBox.from_yolo([0.3, 0.35, 0.4, 0.5], [100, 200]).coords == voc
    assert BBox.from_dict({"x1": 10, "y1": 20, "x2": 50, "y2": 120}).coords == voc


def test_bbox_validation():
    with pytest.raises(TypeError):
        validate_bbox("nope", float)
    with pytest.raises(ValueError):
        validate_bbox([1.0, 2.0, 3.0], float)
    with pytest.raises(ValueError):
        BBox.from_albumentations([0.1, 0.2, 0.3, 4], [10, 10])  # int not allowed
    with pytest.raises(ValueError):
        convert_bbox([0, 0, 1, 1], [10, 10], "voc", "bogus")
    with pytest.raises(ValueError):
        BBox.from_dict({"x1": 1, "y1": 2, "x2": 3, "oops": 4})


def test_bbox_geometry_and_pose_inside():
    b = BBox.from_voc([0, 0, 100, 100])
    assert b.point_inside(0, 0) and b.point_inside(100, 100)
    assert not b.point_inside(101, 50)
    xs = [10] * 17
    ys = [20] * 17
    pose = Pose.from_list([xs, ys])
    assert b.pose_inside(pose)
    outside = Pose.from_list([[150] * 17, ys])
    assert not b.pose_inside(outside)
    # zero-coordinate keypoints (unlabeled) are ignored
    half = Pose.from_list([[0] * 17, [0] * 17])
    assert b.pose_inside(half)


def test_obbox_and_segment():
    ob = OBBox.from_list([0.6, 1.2, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0], title="t")
    assert ob.coords[0] == 1 and len(ob.coords) == 8
    with pytest.raises(ValueError):
        OBBox.from_list([1, 2, 3])
    seg = Segment.from_dict({"x": [1.2, 2.8], "y": [3.0, 4.0]}, title="s")
    assert seg.x == [1, 3] and seg.y == [3, 4]
    with pytest.raises(ValueError):
        Segment.from_list([[1, 2], [3]])


def test_pose3d_keeps_float_visibility():
    p = Pose3D.from_list([[1.4] * 17, [2.6] * 17, [0.25] * 17])
    assert p.x == [1] * 17 and p.y == [3] * 17
    assert p.visible == [0.25] * 17
    with pytest.raises(ValueError):
        Pose3D.from_dict({"x": [1] * 17, "y": [2] * 17})


class _FakeResult:
    def __init__(self, rows):
        self._rows = rows

    def summary(self):
        return self._rows


def test_yolo_converters_from_summary():
    row = {
        "class": 3,
        "name": "dog",
        "confidence": 0.91,
        "box": {"x1": 1.0, "y1": 2.0, "x2": 30.0, "y2": 40.0},
    }
    one = YoloBBox.from_result(_FakeResult([row]))
    assert one.cls == 3 and one.box.coords == [1, 2, 30, 40]
    assert one.box.title == "dog"
    empty = YoloBBox.from_result(_FakeResult([]))
    assert empty.cls == -1 and empty.box.coords == []

    many = YoloBBoxes.from_results([_FakeResult([row]), _FakeResult([row])])
    assert many.cls == [3, 3] and len(many.box) == 2

    pose_row = dict(row, keypoints={"x": [5.0] * 17, "y": [6.0] * 17, "visible": [1.0] * 17})
    yp = YoloPose.from_result(_FakeResult([pose_row]))
    assert yp.pose.x == [5] * 17 and yp.pose.visible == [1.0] * 17

    seg_row = dict(row, segments={"x": [1.0, 2.0], "y": [3.0, 4.0]})
    ys = YoloSegment.from_result(_FakeResult([seg_row]))
    assert ys.segment.x == [1, 2] and ys.segment.title == "dog"


def test_models_as_chain_signals(session):
    """BBox works as a typed UDF output and hydrated input on a chain."""
    import datachain_spark as dc

    ch = dc.read_values(session=session, x1=[0, 10], y1=[0, 10], x2=[5, 30], y2=[5, 30])

    def to_box(x1: int, y1: int, x2: int, y2: int) -> BBox:
        return BBox.from_voc([x1, y1, x2, y2], title="b")

    with_box = ch.map(to_box, output={"box": BBox})

    def area(box: BBox) -> int:
        assert isinstance(box, BBox)
        x1, y1, x2, y2 = box.coords
        return (x2 - x1) * (y2 - y1)

    out = with_box.map(area, params=["box"], output={"area": int})
    assert sorted(out.to_values("area")) == [25, 400]
