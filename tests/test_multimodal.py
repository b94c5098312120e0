"""Multimodal tests: the codec now decodes REAL formats (24-bit BMP,
binary PPM/PGM) with pure header arithmetic — round-trips, malformed-
payload quarantine, mapInPandas batch shapes, and explode semantics."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from hive_to_es_spark.functions.multimodal import (
    _decode_bytes,
    decode_media,
    make_bmp,
    make_ppm,
    resize_media,
    sample_frames,
)


def _media_df(spark):
    """Real images with known shapes: even ids BMP, odd ids PPM."""
    rows = [
        (i, make_bmp(10 + i, 5 + i, i) if i % 2 == 0 else make_ppm(10 + i, 5 + i, i))
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id LONG, media BINARY")


def test_bmp_ppm_roundtrip_exact_dimensions(spark):
    out = {r.doc_id: r for r in decode_media(_media_df(spark)).collect()}
    assert len(out) == 20  # 1 row in -> 1 row out
    for i in range(20):
        r = out[i]
        assert (r.width, r.height) == (10 + i, 5 + i)
        assert r.media_type == ("bmp" if i % 2 == 0 else "ppm")
        expected = make_bmp(10 + i, 5 + i, i) if i % 2 == 0 else make_ppm(10 + i, 5 + i, i)
        assert r.n_bytes == len(expected)


def test_decode_pure_python_matches_spark_path(spark):
    """The header parser itself, off-cluster: exact field recovery."""
    m = _decode_bytes(make_bmp(640, 480))
    assert (m["width"], m["height"], m["kind"]) == (640, 480, "bmp")
    assert m["n_bytes"] == 54 + 480 * ((3 * 640 + 3) // 4 * 4)
    m = _decode_bytes(make_ppm(31, 17))
    assert (m["width"], m["height"], m["kind"]) == (31, 17, "ppm")
    assert m["n_bytes"] == len("P6\n31 17\n255\n") + 3 * 31 * 17


def test_topdown_bmp_negative_height(spark):
    """BMPs may store a NEGATIVE height for top-down row order — the
    decoded dimension is the magnitude."""
    img = bytearray(make_bmp(8, 4))
    struct.pack_into("<i", img, 22, -4)
    m = _decode_bytes(bytes(img))
    assert (m["width"], m["height"]) == (8, 4)


def test_pgm_p5_grayscale(spark):
    payload = b"P5\n12 7\n255\n" + b"\x00" * (12 * 7)
    m = _decode_bytes(payload)
    assert (m["width"], m["height"], m["kind"]) == (12, 7, "pgm")


def test_undecodable_payloads_quarantined_not_fatal(spark):
    """One corrupt blob must never kill the scan: the row survives
    with media_type='undecodable' and NULL shape."""
    rows = [(1, make_bmp(6, 6)), (2, b"\xff\xd8garbage"), (3, b"BM\x00")]
    df = spark.createDataFrame(rows, "doc_id LONG, media BINARY")
    out = {r.doc_id: r for r in decode_media(df).collect()}
    assert len(out) == 3
    assert out[1].media_type == "bmp" and out[1].width == 6
    for bad in (2, 3):
        assert out[bad].media_type == "undecodable"
        assert out[bad].width is None and out[bad].checksum is None
        assert out[bad].n_bytes == len(rows[bad - 1][1])


def test_decode_schema_and_determinism(spark):
    df = _media_df(spark)
    out = decode_media(df)
    assert out.columns == ["doc_id", "media_type", "n_bytes", "width", "height", "checksum"]
    a = {r.doc_id: r.checksum for r in out.collect()}
    b = {r.doc_id: r.checksum for r in decode_media(df).collect()}
    assert a == b and all(v is not None for v in a.values())


def test_resize_bounds(spark):
    decoded = decode_media(_media_df(spark))
    resized = resize_media(decoded, max_px=16)
    rows = resized.collect()
    assert rows and all(r.out_width is not None for r in rows)
    assert all(max(r.out_width, r.out_height) <= 16 + 1 for r in rows)  # +1 for ceil
    assert all(r.scale <= 1.0 for r in rows)


def test_sample_frames_explodes(spark):
    df = _media_df(spark)
    frames = sample_frames(df, every_nth=10)
    assert frames.columns == ["doc_id", "frame_idx", "frame_checksum"]
    per_doc = {r.doc_id: r.n for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert set(per_doc) == set(range(20))  # every doc produced frames
    assert all(n >= 1 for n in per_doc.values())
    idxs = [r.frame_idx for r in frames.filter(F.col("doc_id") == 19).collect()]
    assert idxs == sorted(idxs) and all(i % 10 == 0 for i in idxs)


def test_extract_features_exact_stats_and_padding(spark):
    """m4's worker: uniform-fill images must yield mean_px == fill
    EXACTLY — the BMP widths here make 3*w % 4 != 0, so slurping the
    stride padding (zeros) instead of stripping it would drag the
    mean down and fail this."""
    from hive_to_es_spark.functions.multimodal import extract_features

    rows = [
        (0, make_bmp(7, 3, 200)),   # 3*7=21, stride 24: 3 pad bytes/row
        (1, make_ppm(7, 3, 123)),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, media BINARY")
    got = {r.doc_id: r for r in extract_features(df).collect()}
    assert got[0].mean_px == 200.0 and got[0].n_pixels == 21
    assert got[1].mean_px == 123.0 and got[1].n_pixels == 21
    assert got[0].n_zero_bytes == 0 and got[1].n_zero_bytes == 0


def test_extract_features_quarantines_malformed(spark):
    """The quarantine contract the round-6 review enforced: trailing
    bytes on a PNM, a truncated BMP body, and garbage all surface as
    NULL-stats rows — never wrong numbers, never a crashed stage."""
    from hive_to_es_spark.functions.multimodal import extract_features

    rows = [
        (0, make_ppm(4, 4, 9) + b"\n"),          # trailing byte: size mismatch
        (1, make_bmp(6, 4, 9)[:-5]),              # truncated pixel data
        (2, b"not media at all"),                  # undecodable magic
        (3, make_ppm(4, 4, 7)),                    # control: clean
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, media BINARY")
    got = {r.doc_id: r for r in extract_features(df).collect()}
    for bad in (0, 1, 2):
        assert got[bad].mean_px is None and got[bad].n_pixels is None, bad
    assert got[3].mean_px == 7.0 and got[3].n_pixels == 16


def test_extract_features_honors_bmp_pixel_offset(spark):
    """A BMP whose header advertises extra bytes before the pixels
    (BITMAPV4-style gap) must be read from the OFFSET FIELD, not a
    hardcoded 54."""
    from hive_to_es_spark.functions.multimodal import extract_features

    base = make_bmp(5, 2, 50)
    # splice 8 garbage bytes between header and pixels, bump the
    # offset field (byte 10) and total size (byte 2) accordingly
    gap = b"\xff" * 8
    patched = bytearray(base[:54] + gap + base[54:])
    struct.pack_into("<I", patched, 10, 54 + 8)
    struct.pack_into("<I", patched, 2, len(patched))
    df = spark.createDataFrame(
        [(0, bytes(patched))], "doc_id LONG, media BINARY"
    )
    row = extract_features(df).collect()[0]
    assert row.mean_px == 50.0 and row.n_pixels == 10


def test_image_signature_sees_bmp_row_order(spark):
    """The m6 gradient exists to make row order observable: decoding
    the same BMP WITHOUT unwinding bottom-up storage must flip the
    row profile and change sig_rows. Guards the exact bug class m4's
    uniform fills cannot detect."""
    from hive_to_es_spark.functions.multimodal import (
        _band_signature,
        _decode_gray_rows,
        _gradient_px,
        make_bmp_gradient,
    )

    w, h, seed = 33, 20, 7
    payload = make_bmp_gradient(w, h, seed)
    kind, dw, dh, rows = _decode_gray_rows(payload)
    assert (kind, dw, dh) == ("bmp", w, h)
    assert rows == [[_gradient_px(seed, x, y) for x in range(w)] for y in range(h)]
    rowsum = [sum(r) for r in rows]
    flipped = list(reversed(rowsum))
    assert _band_signature(rowsum, w, h) != _band_signature(flipped, w, h), (
        "gradient too symmetric - row order not observable"
    )


def test_image_signature_honors_bmp_pixel_offset(spark):
    """Same offset-field contract as extract_features: a BITMAPV4-style
    gap before the pixel array must be honored, not a hardcoded 54."""
    from hive_to_es_spark.functions.multimodal import (
        _decode_gray_rows,
        _gradient_px,
        make_bmp_gradient,
    )

    base = make_bmp_gradient(5, 3, 11)
    gap = b"\xff" * 8
    patched = bytearray(base[:54] + gap + base[54:])
    struct.pack_into("<I", patched, 10, 54 + 8)
    struct.pack_into("<I", patched, 2, len(patched))
    _, _, _, rows = _decode_gray_rows(bytes(patched))
    assert rows == [[_gradient_px(11, x, y) for x in range(5)] for y in range(3)]


def test_image_signature_handles_topdown_bmp(spark):
    """Negative biHeight = top-down BMP (the variant _decode_bytes
    already abs()es): rows must NOT be reversed for it."""
    from hive_to_es_spark.functions.multimodal import (
        _decode_gray_rows,
        _gradient_px,
        make_bmp_gradient,
    )

    w, h, seed = 7, 5, 3
    base = bytearray(make_bmp_gradient(w, h, seed))
    # flip to top-down: negate the height field and re-order the rows
    struct.pack_into("<i", base, 22, -h)
    stride = (3 * w + 3) // 4 * 4
    body = base[54:]
    reordered = b"".join(
        bytes(body[fy * stride:(fy + 1) * stride]) for fy in reversed(range(h))
    )
    topdown = bytes(base[:54]) + reordered
    _, _, _, rows = _decode_gray_rows(topdown)
    assert rows == [[_gradient_px(seed, x, y) for x in range(w)] for y in range(h)]


def test_make_avi_structure_and_frame_sampling(spark):
    """m8's worker on hand-built containers: a 7-wide frame has
    stride padding (3*7=21 -> 24), so a parser that slurps the pad
    zeros would shift the fill mean and fail the exact fill check;
    chunk walk must visit every frame and emit only the even ones."""
    from hive_to_es_spark.functions.multimodal import (
        make_avi,
        video_frame_sample,
    )

    fills = [10, 20, 30, 40, 50]
    payload = make_avi(7, 3, fills)
    stride_bytes = (3 * 7 + 3) // 4 * 4 * 3
    assert len(payload) == 224 + 5 * (8 + stride_bytes)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    df = spark.createDataFrame([(1, payload)], "doc_id LONG, video BINARY")
    got = sorted(
        (r.frame_idx, r.frame_fill, r.frame_bytes, r.n_frames, r.width, r.height)
        for r in video_frame_sample(df, every_nth=2).collect()
    )
    assert got == [
        (0, 10, stride_bytes, 5, 7, 3),
        (2, 30, stride_bytes, 5, 7, 3),
        (4, 50, stride_bytes, 5, 7, 3),
    ]


def test_video_frame_sample_rejects_corrupt_container(spark):
    """A truncated or id-corrupted container must FAIL the task (the
    m8 contract is byte-real parsing, not best-effort): flipping one
    chunk fourcc byte or dropping the trailer must raise."""
    import pytest

    from hive_to_es_spark.functions.multimodal import (
        make_avi,
        video_frame_sample,
    )

    good = make_avi(4, 2, [9, 9])
    bad_chunk = bytearray(good)
    bad_chunk[224] ^= 0xFF  # first '00db' fourcc byte
    truncated = good[:-4]
    for payload in (bytes(bad_chunk), truncated):
        df = spark.createDataFrame([(1, payload)], "doc_id LONG, video BINARY")
        with pytest.raises(Exception):
            video_frame_sample(df).collect()


def test_m9_pack_budget_and_ordering(spark, sf_dir):
    """m9's two contract assertions beyond the oracle hash (r8 verdict
    task 5): every sequence respects the budget up to ONE unsplit item
    (greedy start-offset packing overflows by < max item weight), and
    sequences tile the global (doc_id, item_no) order — consecutive
    seq_ids never interleave doc ranges. Plus conservation: items and
    tokens are partitioned exactly (one image + ceil(nt/16) chunks per
    doc), and every sequence but the last starts full."""
    from pyspark.sql import functions as F

    from hive_to_es_spark.io import load_tables
    from hive_to_es_spark.registry import queries

    rows = sorted(
        queries()["m9_multimodal_pack"](spark, sf_dir).collect(),
        key=lambda r: r.seq_id,
    )
    assert [r.seq_id for r in rows] == list(range(len(rows)))  # dense ids
    MAX_ITEM = 40  # ceil(60/8) * ceil(40/8) vision tokens
    for r in rows:
        assert r.text_tokens + r.image_tokens == r.total_tokens
        assert r.total_tokens < 256 + MAX_ITEM, r
        assert r.n_items >= 1 and r.n_images <= r.n_docs
    # a sequence ends only when the next item would start past the
    # boundary: cumulative totals reach each 256 line before a new
    # sequence opens (every seq but the last fills to >= 256 - MAX_ITEM
    # ... exactly: next seq's start offset = this cumulative total)
    cum = 0
    for r in rows[:-1]:
        cum += r.total_tokens
        assert cum >= (r.seq_id + 1) * 256, r
    # ordering: doc ranges never interleave across sequence boundaries
    for a, b in zip(rows, rows[1:]):
        assert a.max_doc <= b.min_doc, (a, b)
    # conservation vs the per-doc item model
    d = load_tables(spark, sf_dir).documents
    exp = d.select(
        F.expr(
            "CAST(((1 + n_chars % 60 + 7) div 8) * ((1 + doc_id % 40 + 7) div 8) AS BIGINT)"
        ).alias("img"),
        F.expr(
            "(size(split(lower(text), ' ')) + 15) div 16"
        ).alias("nchunks"),
        F.expr("CAST(size(split(lower(text), ' ')) AS BIGINT)").alias("nt"),
    ).agg(
        F.sum("img").alias("img_tok"),
        F.sum("nchunks").alias("chunks"),
        F.sum("nt").alias("text_tok"),
        F.count("*").alias("ndocs"),
    ).first()
    assert sum(r.n_images for r in rows) == exp.ndocs
    assert sum(r.image_tokens for r in rows) == exp.img_tok
    assert sum(r.text_tokens for r in rows) == exp.text_tok
    assert sum(r.n_items for r in rows) == exp.ndocs + exp.chunks
