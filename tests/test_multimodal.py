"""Multimodal plumbing tests: schemas, mapInPandas batch shapes, and
explode semantics are real even though the codec is stubbed."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_to_es_spark.functions.multimodal import decode_media, resize_media, sample_frames


def _media_df(spark):
    rows = [(i, f"payload-{i}".encode() * (i + 1)) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id LONG, media BINARY")


def test_decode_schema_and_determinism(spark):
    df = _media_df(spark)
    out = decode_media(df)
    assert out.columns == ["doc_id", "media_type", "n_bytes", "width", "height", "checksum"]
    a = {r.doc_id: r.checksum for r in out.collect()}
    b = {r.doc_id: r.checksum for r in decode_media(df).collect()}
    assert a == b  # stub decode is deterministic
    assert out.count() == 20  # 1 row in -> 1 row out


def test_resize_bounds(spark):
    decoded = decode_media(_media_df(spark))
    resized = resize_media(decoded, max_px=512)
    bad = resized.filter(
        (F.greatest("out_width", "out_height") > 512 + 1)  # +1 for ceil
        | (F.col("scale") > 1.0)
    ).count()
    assert bad == 0


def test_sample_frames_explodes(spark):
    df = _media_df(spark)
    frames = sample_frames(df, every_nth=10)
    assert frames.columns == ["doc_id", "frame_idx", "frame_checksum"]
    per_doc = {r.doc_id: r.n for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert set(per_doc) == set(range(20))  # every doc produced frames
    assert all(n >= 1 for n in per_doc.values())
    idxs = [r.frame_idx for r in frames.filter(F.col("doc_id") == 19).collect()]
    assert idxs == sorted(idxs) and all(i % 10 == 0 for i in idxs)
