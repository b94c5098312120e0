"""Multimodal column processing: decode / feature-extract / resize /
frame-sample over opaque binary media columns (SURVEY.md §2.D m1).

The codec layer decodes REAL formats with pure header arithmetic — no
image libraries exist in this container, and none are needed for BMP
(fixed-offset little-endian fields) or PNM (ASCII header): the
encoders below emit spec-conformant files and `_decode_bytes` parses
them back byte-for-byte. Heavier codecs (JPEG/PNG/audio/video) slot
into the same single function (PIL / torchaudio / pyav), changing
nothing in the Spark plumbing.

Why mapInPandas (not pandas_udf): media decode is batch-at-a-time
Python regardless, and mapInPandas lets one input batch yield a
DIFFERENT number of output rows (frame sampling explodes, filtering
contracts) while streaming Arrow batches through a generator — bounded
memory per task even when individual media objects are large.
"""

from __future__ import annotations

import hashlib
import re
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of decode_media: one row per input row.
DECODE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes INT, width INT, height INT, checksum STRING"
)

# Output schema of sample_frames: one row per sampled frame (explodes).
FRAMES_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_checksum STRING"

# Output schema of encode_fixture_media.
MEDIA_SCHEMA = "doc_id BIGINT, media BINARY"


def encode_fixture_media(docs: DataFrame, id_col: str = "doc_id",
                         chars_col: str = "n_chars") -> DataFrame:
    """Deterministic REAL media payloads for every document: a
    spec-conformant image whose dimensions are pure functions of the
    row (width = 1 + n_chars % 60, height = 1 + doc_id % 40), even
    ids as 24-bit BMP, odd ids as binary PPM. Because the dimensions
    derive from table columns, a SQL oracle can independently predict
    exactly what the byte-level decode must recover — which is what
    lets m2 be value-verified rather than rows-only."""

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf[id_col], pdf[chars_col]):
                w, h = 1 + int(n_chars) % 60, 1 + int(doc_id) % 40
                payloads.append(
                    make_bmp(w, h, int(doc_id)) if doc_id % 2 == 0
                    else make_ppm(w, h, int(doc_id))
                )
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "media": payloads})

    return docs.select(id_col, chars_col).mapInPandas(enc, MEDIA_SCHEMA)


def make_bmp(width: int, height: int, fill: int = 0) -> bytes:
    """A real, minimal 24-bit uncompressed BMP: 14-byte file header +
    40-byte BITMAPINFOHEADER + bottom-up pixel rows padded to 4-byte
    stride. Any image viewer opens these. Size is pure arithmetic:
    54 + height * (((3 * width) + 3) // 4 * 4)."""
    stride = (3 * width + 3) // 4 * 4
    pixel_bytes = stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    row = (bytes([fill % 256]) * (3 * width)).ljust(stride, b"\x00")
    return header + row * height


def make_ppm(width: int, height: int, fill: int = 0) -> bytes:
    """A real binary PPM (P6): ASCII header then 3 bytes per pixel.
    Size = len("P6\\n{w} {h}\\n255\\n") + 3*w*h — the header length
    varies with the DIGIT COUNT of the dimensions, which the m2 oracle
    reproduces in SQL (the sharpest proof the decode is byte-real)."""
    return f"P6\n{width} {height}\n255\n".encode() + bytes([fill % 256]) * (
        3 * width * height
    )


def _decode_bytes(payload: bytes) -> dict:
    """Real header decode for BMP and PNM (PPM/PGM) payloads.

    BMP: magic "BM"; width/height are little-endian ints at fixed
    BITMAPINFOHEADER offsets 18/22 (height may be negative for
    top-down files — the dimension is its magnitude). PNM: magic
    "P5"/"P6"; dimensions are the first two ASCII tokens after the
    magic. Undecodable payloads raise ValueError — callers quarantine
    (decode_media keeps the row with a NULL shape so one corrupt blob
    can't kill a 100 TB scan; see its docstring).
    """
    if payload[:2] == b"BM" and len(payload) >= 54:
        width = struct.unpack_from("<i", payload, 18)[0]
        height = abs(struct.unpack_from("<i", payload, 22)[0])
        kind = "bmp"
    elif payload[:2] in (b"P5", b"P6"):
        tokens = payload[2:64].split()
        if len(tokens) < 2:
            raise ValueError("truncated PNM header")
        width, height = int(tokens[0]), int(tokens[1])
        kind = "pgm" if payload[:2] == b"P5" else "ppm"
    else:
        raise ValueError(f"unknown media magic {payload[:2]!r}")
    if width <= 0 or height <= 0:
        raise ValueError(f"non-positive dimensions {width}x{height}")
    digest = hashlib.sha1(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "width": width,
        "height": height,
        "checksum": digest[:16],
        "kind": kind,
    }


def decode_media(df: DataFrame, id_col: str = "doc_id",
                 media_col: str = "media") -> DataFrame:
    """Decode an opaque binary column into typed media metadata.

    1 row in -> 1 row out; runs as mapInPandas so decode never holds
    more than one Arrow batch of media bytes in memory per task.
    Undecodable payloads are QUARANTINED, not fatal: the row survives
    with media_type='undecodable' and NULL shape, because at corpus
    scale one corrupt blob must never kill the scan — filter or route
    the quarantined rows downstream.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = []
            for b in pdf[media_col]:
                raw = bytes(b)
                try:
                    meta.append(_decode_bytes(raw))
                except ValueError:
                    meta.append(
                        {"n_bytes": len(raw), "width": None, "height": None,
                         "checksum": None, "kind": "undecodable"}
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "media_type": [m["kind"] for m in meta],
                    "n_bytes": [m["n_bytes"] for m in meta],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "checksum": [m["checksum"] for m in meta],
                }
            )

    return df.select(id_col, media_col).mapInPandas(decode, DECODE_SCHEMA)


def resize_media(df: DataFrame, max_px: int = 512) -> DataFrame:
    """Resize stage over decoded metadata: pure column arithmetic (the
    scale factor), demonstrating that post-decode transforms should
    LEAVE Python — only the codec itself needs mapInPandas."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_px) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return df.select(
        "*",
        F.round(scale, 6).alias("scale"),
        F.ceil(F.col("width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_height"),
    )


def sample_frames(df: DataFrame, every_nth: int = 10, id_col: str = "doc_id",
                  media_col: str = "media") -> DataFrame:
    """Frame-sampling stage (video shape): 1 row in -> K rows out.

    The stub derives a deterministic frame count from the payload and
    emits every_nth frame's checksum; a real implementation would pull
    frames via pyav. The exploding row count is why this is
    mapInPandas and not a scalar UDF.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                raw = bytes(payload)
                n_frames = 1 + len(raw) % 300  # fake 1..300 frames
                for i in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(hashlib.sha1(raw + i.to_bytes(4, "big")).hexdigest()[:12])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_checksum": sums})

    return df.select(id_col, media_col).mapInPandas(sample, FRAMES_SCHEMA)


# Output schema of extract_features: per-image pixel statistics.
FEATURES_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_pixels BIGINT, "
    "mean_px DOUBLE, n_zero_bytes BIGINT"
)


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     media_col: str = "media") -> DataFrame:
    """Pixel-level feature extraction — the stage between decode and
    model input: per-image channel statistics computed over the ACTUAL
    pixel bytes, honoring each format's layout.

    The layout handling is the point: BMP rows are padded to a 4-byte
    stride, and the padding is NOT pixel data — a reader that slurps
    the raw pixel area (including pad zeros) gets the wrong mean for
    every width where 3*w % 4 != 0. PPM is tightly packed but its
    header length varies with the dimensions' digit count. The m4
    oracle predicts the statistics from table columns alone, so either
    mistake breaks the hash.

    Undecodable payloads yield a NULL-stats row (same quarantine
    discipline as decode_media). A real pipeline would swap the stats
    for a model-input tensor; batch shape and schema stay the same.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "media_type": [], "n_pixels": [],
                "mean_px": [], "n_zero_bytes": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                raw = bytes(payload)
                out["doc_id"].append(doc_id)
                try:
                    meta = _decode_bytes(raw)
                    w, h = meta["width"], meta["height"]
                    if meta["kind"] == "bmp":
                        # pixel data starts at the OFFSET FIELD (byte
                        # 10), not a hardcoded 54 — BITMAPV4/V5 files
                        # carry color-profile bytes before the pixels
                        off = struct.unpack_from("<I", raw, 10)[0]
                        stride = (3 * w + 3) // 4 * 4
                        body = raw[off:off + stride * h]
                        if len(body) < stride * h:
                            raise ValueError("truncated BMP pixel data")
                        rows = np.frombuffer(body, dtype=np.uint8)
                        # drop per-row padding: stride x h -> 3w x h
                        px = rows.reshape(h, stride)[:, : 3 * w]
                    else:
                        # P5/P6: pixels start AFTER the parsed header
                        # (magic + 3 ASCII tokens + 1 whitespace), not
                        # at len-derived offsets — a payload with
                        # trailing bytes must quarantine, not skew
                        m = re.match(rb"^P[56]\s+\d+\s+\d+\s+\d+\s", raw)
                        if m is None:
                            raise ValueError("unparseable PNM header")
                        per_px = 1 if meta["kind"] == "pgm" else 3
                        body = raw[m.end():]
                        if len(body) != per_px * w * h:
                            raise ValueError(
                                f"PNM body {len(body)}B != {per_px * w * h}B expected"
                            )
                        px = np.frombuffer(body, dtype=np.uint8)
                    out["media_type"].append(meta["kind"])
                    out["n_pixels"].append(w * h)
                    out["mean_px"].append(round(float(px.mean()), 4))
                    out["n_zero_bytes"].append(int((px == 0).sum()))
                except (ValueError, IndexError):
                    out["media_type"].append(None)
                    out["n_pixels"].append(None)
                    out["mean_px"].append(None)
                    out["n_zero_bytes"].append(None)
            yield pd.DataFrame(out)

    return df.select(id_col, media_col).mapInPandas(feats, FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Audio modality: real RIFF/WAV container, deterministic synthetic PCM
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = "doc_id long, audio binary"
AUDIO_FEATURES_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, duration_ms int, "
    "peak int, sum_amp long, energy long"
)
_WAV_RATE = 8000


def make_wav(samples: bytes, sample_rate: int = _WAV_RATE) -> bytes:
    """A real, minimal WAV file: 12-byte RIFF header + 24-byte fmt
    chunk (PCM, mono, 8-bit) + data chunk. Any audio player opens
    these; total size = 44 + len(samples)."""
    n = len(samples)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + n, b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 1, 1, 8
        )
        + struct.pack("<4sI", b"data", n)
        + samples
    )


def encode_fixture_audio(docs: DataFrame, id_col: str = "doc_id",
                         chars_col: str = "n_chars") -> DataFrame:
    """Deterministic REAL audio payloads: 8-bit mono 8 kHz PCM in a
    spec-conformant WAV container, sample i = (doc_id*31 + i*17) % 256
    and n_samples = 1 + n_chars % 400 — pure functions of the row, so
    a SQL oracle can independently re-derive every statistic the
    byte-level decode must recover (the m2/m4 trick, audio edition).
    No audio libraries exist in this environment; the container is
    built by header arithmetic, which is exactly what makes the
    decode testable rather than stubbed."""

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf[id_col], pdf[chars_col]):
                n = 1 + int(n_chars) % 400
                s = ((int(doc_id) * 31 + np.arange(n, dtype=np.int64) * 17) % 256)
                payloads.append(make_wav(s.astype(np.uint8).tobytes()))
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "audio": payloads})

    return docs.select(id_col, chars_col).mapInPandas(enc, AUDIO_SCHEMA)


def audio_features(df: DataFrame, id_col: str = "doc_id",
                   audio_col: str = "audio") -> DataFrame:
    """Decode the WAV container (sample rate from the fmt chunk at
    byte 24, PCM data after the 44-byte canonical header) and compute
    waveform statistics over the ACTUAL bytes: peak amplitude, exact
    integer amplitude sum and energy (sum of squares) — the loudness/
    silence features an audio-corpus pipeline gates on. All-integer
    outputs, so the whole stage value-verifies cross-engine."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[audio_col]):
                b = bytes(payload)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError(f"doc {doc_id}: not a RIFF/WAVE payload")
                rate = int.from_bytes(b[24:28], "little")
                n_data = int.from_bytes(b[40:44], "little")
                arr = np.frombuffer(b[44 : 44 + n_data], dtype=np.uint8)
                rows.append(
                    (
                        int(doc_id),
                        rate,
                        int(arr.size),
                        int(arr.size) * 1000 // rate,
                        int(arr.max()),
                        int(arr.sum()),
                        int((arr.astype(np.int64) ** 2).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "duration_ms",
                    "peak", "sum_amp", "energy",
                ],
            )

    return df.mapInPandas(feats, AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Gradient images + perceptual signature (m6)

# Output schema of image_signature.
SIGNATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, width INT, height INT, "
    "total_sum BIGINT, sig_cols BIGINT, sig_rows BIGINT"
)


def _gradient_px(seed: int, x: int, y: int) -> int:
    """The fixture gradient: pixel (x, y) of image `seed` in TOP-DOWN
    image coordinates. NON-uniform by design — unlike m2/m4's flat
    fills, a gradient makes row ORDER observable, so a decoder that
    forgets BMP stores rows bottom-up (or miscounts stride padding)
    produces a flipped row profile and a different signature."""
    return (seed * 7 + y * 13 + x * 3) % 256


def make_bmp_gradient(width: int, height: int, seed: int) -> bytes:
    """make_bmp's layout (24-bit, 4-byte stride, BOTTOM-UP rows) with
    per-pixel grayscale values from `_gradient_px`."""
    stride = (3 * width + 3) // 4 * 4
    pixel_bytes = stride * height
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    rows = []
    for file_row in range(height):
        y = height - 1 - file_row  # bottom-up: first stored row is the last image row
        row = bytes(
            _gradient_px(seed, x, y) for x in range(width) for _ in range(3)
        )
        rows.append(row.ljust(stride, b"\x00"))
    return header + b"".join(rows)


def make_ppm_gradient(width: int, height: int, seed: int) -> bytes:
    """make_ppm's container (P6, TOP-DOWN rows) with `_gradient_px`
    grayscale pixels — the opposite row order from BMP, so one
    signature pass must handle both."""
    body = bytes(
        _gradient_px(seed, x, y)
        for y in range(height)
        for x in range(width)
        for _ in range(3)
    )
    return f"P6\n{width} {height}\n255\n".encode() + body


def encode_fixture_gradient(docs: DataFrame, id_col: str = "doc_id",
                            chars_col: str = "n_chars") -> DataFrame:
    """Gradient twin of encode_fixture_media: same dimension formulas
    (width = 1 + n_chars % 60, height = 1 + doc_id % 40), same
    even=BMP / odd=PPM split, non-uniform pixels."""

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf[id_col], pdf[chars_col]):
                w, h = 1 + int(n_chars) % 60, 1 + int(doc_id) % 40
                payloads.append(
                    make_bmp_gradient(w, h, int(doc_id)) if doc_id % 2 == 0
                    else make_ppm_gradient(w, h, int(doc_id))
                )
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "media": payloads})

    return docs.select(id_col, chars_col).mapInPandas(enc, MEDIA_SCHEMA)


def _decode_gray_rows(payload: bytes) -> tuple[str, int, int, list[list[int]]]:
    """Decode a BMP or P6 payload to TOP-DOWN grayscale rows (first
    channel of each pixel). Handles BMP's bottom-up row order and
    stride padding and PPM's variable-length ASCII header."""
    meta = _decode_bytes(payload)
    w, h = meta["width"], meta["height"]
    if meta["kind"] == "bmp":
        off = struct.unpack_from("<I", payload, 10)[0]  # pixel-array offset field
        stride = (3 * w + 3) // 4 * 4
        rows = [
            [payload[off + fy * stride + 3 * x] for x in range(w)]
            for fy in range(h)
        ]
        # Positive biHeight = bottom-up storage (the common case);
        # negative = top-down, already in image order — same contract
        # _decode_bytes documents with its abs().
        if struct.unpack_from("<i", payload, 22)[0] > 0:
            rows.reverse()
        return "bmp", w, h, rows
    if meta["kind"] == "ppm":
        m = re.match(rb"P6\s+\d+\s+\d+\s+\d+\s", payload)
        if not m:
            raise ValueError("unparseable PPM header")
        off = m.end()
        rows = [
            [payload[off + (y * w + x) * 3] for x in range(w)]
            for y in range(h)
        ]
        return "ppm", w, h, rows
    raise ValueError(f"image_signature: unsupported kind {meta['kind']}")


def _band_signature(profile: list[int], n_ortho: int, dim: int) -> int:
    """dHash-style 8-bit signature over a 9-band resampling of an
    integer projection profile. Band i covers indices
    [i*dim//9, (i+1)*dim//9); bit i compares the MEANS of bands i and
    i+1 by integer cross-multiplication (sum_i * n_{i+1} > sum_{i+1}
    * n_i) — no float division anywhere, so the bit pattern is exact
    and engine-portable. Empty bands (dim < 9) compare 0 > 0 = 0."""
    sums = [sum(profile[i * dim // 9:(i + 1) * dim // 9]) for i in range(9)]
    ns = [((i + 1) * dim // 9 - i * dim // 9) * n_ortho for i in range(9)]
    return sum(
        (1 << i) for i in range(8) if sums[i] * ns[i + 1] > sums[i + 1] * ns[i]
    )


def image_signature(df: DataFrame, id_col: str = "doc_id",
                    media_col: str = "media") -> DataFrame:
    """Perceptual image signature over a binary media column: decode
    to top-down grayscale, project to column/row sum profiles, and
    emit two 8-bit dHash-style band signatures plus the total pixel
    sum. 1 row in -> 1 row out, Arrow-batched; near-duplicate images
    then group by (sig_cols, sig_rows) or join within a Hamming
    radius — the blocking key step of image dedup, with the same
    plumbing a pHash/embedding model would ride."""

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "media_type", "width", "height",
                    "total_sum", "sig_cols", "sig_rows")}
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                kind, w, h, rows = _decode_gray_rows(bytes(payload))
                colsum = [sum(rows[y][x] for y in range(h)) for x in range(w)]
                rowsum = [sum(r) for r in rows]
                out["doc_id"].append(doc_id)
                out["media_type"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["total_sum"].append(sum(rowsum))
                out["sig_cols"].append(_band_signature(colsum, h, w))
                out["sig_rows"].append(_band_signature(rowsum, w, h))
            yield pd.DataFrame(out)

    return df.mapInPandas(sig, SIGNATURE_SCHEMA)


# ---------------------------------------------------------------------------
# AVI video container (m8) — the video rung of the multimodal ladder:
# m2/m4/m6 are images, m5 audio, m3 frame sampling over an opaque
# payload; m8 builds and parses a REAL video container.

VIDEO_SCHEMA = "doc_id long, video binary"
VIDEO_FRAMES_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, n_frames INT, width INT, height INT, "
    "frame_idx INT, frame_fill INT, frame_bytes BIGINT"
)
_AVI_FPS = 10


def _pad4(n: int) -> int:
    return (n + 3) // 4 * 4


def make_avi(width: int, height: int, fills: list[int]) -> bytes:
    """A real, minimal AVI container built by header arithmetic (no
    media libs — the make_wav approach applied to RIFF/AVI):
    RIFF('AVI ') + LIST hdrl (56-byte avih + LIST strl with a 56-byte
    'vids'/'DIB ' strh and a 40-byte BITMAPINFOHEADER strf) + LIST
    movi holding one '00db' chunk per frame of uncompressed 24-bit
    BGR with rows padded to 4 bytes (the BMP stride rule). Frame i is
    a uniform fill of fills[i]. Total size is pure arithmetic:
    224 + n_frames * (8 + frame_bytes)."""
    stride = _pad4(3 * width)
    fb = stride * height
    frames = []
    for f in fills:
        row = bytes([f]) * (3 * width) + b"\x00" * (stride - 3 * width)
        frames.append(b"00db" + struct.pack("<I", fb) + row * height)
    movi = (
        b"LIST"
        + struct.pack("<I", 4 + sum(len(c) for c in frames))
        + b"movi"
        + b"".join(frames)
    )
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I",
        1_000_000 // _AVI_FPS, fb * _AVI_FPS, 0, 0, len(fills), 0, 1, fb,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"strh" + struct.pack("<I", 56) + b"vids" + b"DIB "
        + struct.pack(
            "<IHH8I4H", 0, 0, 0, 0, 1, _AVI_FPS, 0, len(fills), fb, 0, 0,
            0, 0, width, height,
        )
    )
    strf = b"strf" + struct.pack("<I", 40) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, fb, 0, 0, 0, 0
    )
    strl = (
        b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl"
        + strh + strf
    )
    hdrl = (
        b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl"
        + avih + strl
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_fixture_video(docs: DataFrame, id_col: str = "doc_id",
                         chars_col: str = "n_chars") -> DataFrame:
    """Deterministic REAL video payloads: width = 1 + n_chars % 16,
    height = 1 + doc_id % 12, n_frames = 1 + doc_id % 9, frame i a
    uniform fill of (doc_id*31 + i*7) % 256 — pure functions of the
    row, so a SQL oracle independently re-derives every value the
    byte-level parse must recover (the m2/m5 trick, video edition)."""

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf[id_col], pdf[chars_col]):
                did, w = int(doc_id), 1 + int(n_chars) % 16
                h, n = 1 + did % 12, 1 + did % 9
                payloads.append(
                    make_avi(w, h, [(did * 31 + i * 7) % 256 for i in range(n)])
                )
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "video": payloads})

    return docs.select(id_col, chars_col).mapInPandas(enc, VIDEO_SCHEMA)


def video_frame_sample(df: DataFrame, every_nth: int = 2,
                       id_col: str = "doc_id",
                       video_col: str = "video") -> DataFrame:
    """Parse the AVI container and emit every `every_nth` frame's
    statistics (m3's 1-row-in -> K-rows-out mapInPandas signature over
    a REAL container): frame geometry from the avih header, per-frame
    byte size from the '00db' chunk headers (cross-checked against
    strf's biSizeImage), and the frame's uniform fill value from the
    stride-stripped pixel bytes. A parser that misreads a header
    field, miscounts a chunk, or forgets the row padding shifts a
    value and breaks the oracle hash. Embarrassingly parallel, Arrow-
    batched, no shuffle; a real decoder (pyav) slots into the same
    iterator with the same schema."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[video_col]):
                b = bytes(payload)
                if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
                    raise ValueError(f"doc {doc_id}: not a RIFF/AVI payload")
                if b[12:16] != b"LIST" or b[20:24] != b"hdrl":
                    raise ValueError(f"doc {doc_id}: missing hdrl LIST")
                if b[24:28] != b"avih":
                    raise ValueError(f"doc {doc_id}: missing avih chunk")
                avih = b[32 : 32 + 56]
                n_frames = int.from_bytes(avih[16:20], "little")
                w = int.from_bytes(avih[32:36], "little")
                h = int.from_bytes(avih[36:40], "little")
                size_image = int.from_bytes(b[192:196], "little")  # strf
                hdrl_end = 20 + int.from_bytes(b[16:20], "little")
                if b[hdrl_end : hdrl_end + 4] != b"LIST" or \
                        b[hdrl_end + 8 : hdrl_end + 12] != b"movi":
                    raise ValueError(f"doc {doc_id}: missing movi LIST")
                stride = (3 * w + 3) // 4 * 4
                pos = hdrl_end + 12
                for i in range(n_frames):
                    if b[pos : pos + 4] != b"00db":
                        raise ValueError(f"doc {doc_id}: frame {i} chunk id")
                    fb = int.from_bytes(b[pos + 4 : pos + 8], "little")
                    if fb != size_image:
                        raise ValueError(f"doc {doc_id}: frame {i} size")
                    if i % every_nth == 0:
                        px = np.frombuffer(
                            b[pos + 8 : pos + 8 + fb], dtype=np.uint8
                        ).reshape(h, stride)[:, : 3 * w]
                        rows.append(
                            (
                                int(doc_id), len(b), n_frames, w, h, i,
                                int(px.sum()) // px.size, fb,
                            )
                        )
                    pos += 8 + fb
                if pos != len(b):
                    raise ValueError(f"doc {doc_id}: trailing bytes")
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "n_frames", "width", "height",
                    "frame_idx", "frame_fill", "frame_bytes",
                ],
            )

    return df.mapInPandas(sample, VIDEO_FRAMES_SCHEMA)
