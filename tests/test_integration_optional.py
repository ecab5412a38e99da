"""Integration tests for the environment-bound closures (VERDICT r05 #9):
the real `datasets` load_dataset path, the spark-avro jar, and the real
PIL image decode. Each skips cleanly when its optional dependency is
absent (this container ships none of them) and goes green the moment the
environment grows it — no code change needed.
"""

import os

import pytest


def test_read_hf_real_load_dataset(session, tmp_path):
    datasets = pytest.importorskip("datasets")  # noqa: F841
    import json

    import datachain_spark as dc

    p = tmp_path / "rows.jsonl"
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"id": i, "txt": f"row {i}"}) + "\n")
    # a STRING dataset name routes through the real datasets.load_dataset
    # (the "json" builder reads local files — no network)
    chain = dc.read_hf("json", data_files=str(p), split="train")
    rows = sorted(chain.to_records(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == list(range(5))
    assert rows[0]["txt"] == "row 0"


def test_avro_roundtrip_when_jar_present(session, tmp_path):
    import datachain_spark as dc

    src = dc.read_parquet("/root/testdata/sf0.001/region.parquet")
    out = os.path.join(str(tmp_path), "region_avro")
    try:
        src.df.write.format("avro").save(out)
    except Exception as exc:  # jar absent: AnalysisException FAILED_TO_FIND
        msg = str(exc).lower()
        if "avro" in msg and ("find" in msg or "provider" in msg):
            pytest.skip("spark-avro jar not on the classpath")
        raise
    back = dc.read_avro(out)
    assert sorted(r["r_regionkey"] for r in back.to_records()) == sorted(
        r["r_regionkey"] for r in src.to_records()
    )


def test_real_image_decode_and_resize_with_pil(spark):
    Image = pytest.importorskip("PIL.Image")
    import io

    from datachain_spark.ops.multimodal import extract_image_meta, resize_images

    def png_bytes(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (10, 20, 30)).save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, png_bytes(320, 200)), (2, png_bytes(64, 64)), (3, None)],
        "id int, content binary",
    )
    meta = {r["id"]: r["image"] for r in extract_image_meta(df).collect()}
    assert meta[1]["width"] == 320 and meta[1]["height"] == 200
    assert meta[1]["format"] == "png" and meta[3] is None

    resized = {r["id"]: r["content"]
               for r in resize_images(df, width=32, height=16).collect()}
    with Image.open(io.BytesIO(bytes(resized[1]))) as im:
        assert (im.width, im.height) == (32, 16)
    assert resized[3] is None
