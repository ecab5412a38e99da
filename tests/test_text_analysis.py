

def test_strip_boilerplate_semantics(spark):
    # Onion-style: the high-df footer vanishes from EVERY doc (unlike
    # segment_dedup's keep-first), the rare line survives, short lines
    # are never counted or stripped, NULL text passes through.
    from datachain_spark.ops.text import strip_boilerplate

    footer = "Subscribe to our newsletter"
    rows = [(i, f"unique body {i}\n--\n{footer}") for i in range(20)]
    rows += [(100, f"rare note\nunique body 100\n{footer}"),
             (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in strip_boilerplate(
        df, "doc_id", min_doc_frac=0.05, min_docs=2
    ).collect()}
    assert all(footer not in out[i]["text"] for i in range(20))
    assert out[0]["text"] == "unique body 0\n--"   # short '--' survives
    assert out[0]["n_stripped"] == 1
    assert "rare note" in out[100]["text"]          # df=1 < threshold
    assert out[101]["text"] is None and out[101]["n_stripped"] == 0
    import pytest as _pt
    with _pt.raises(ValueError, match="min_doc_frac"):
        strip_boilerplate(df, "doc_id", min_doc_frac=0.0)
