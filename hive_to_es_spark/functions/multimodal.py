"""Multimodal column processing: decode / feature-extract / resize /
frame-sample over opaque binary media columns (SURVEY.md §2.D m1).

The Spark-side contract is fully real and tested: typed schemas,
mapInPandas iterator plumbing, Arrow batch shapes, and partition
behavior. The codec layer is STUBBED — this container ships no
image/audio/video libraries — behind `_decode_bytes`, which produces a
deterministic fake "decode" (shape + checksum derived from the bytes).
Swapping in a real codec (PIL / torchaudio / pyav) changes ONE
function and nothing in the Spark plumbing.

Why mapInPandas (not pandas_udf): media decode is batch-at-a-time
Python regardless, and mapInPandas lets one input batch yield a
DIFFERENT number of output rows (frame sampling explodes, filtering
contracts) while streaming Arrow batches through a generator — bounded
memory per task even when individual media objects are large.
"""

from __future__ import annotations

import hashlib
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


def _decode_bytes(payload: bytes) -> dict:
    """STUB codec. Deterministic fake decode: derives a stable
    (width, height, checksum) from the payload bytes.

    Replace with a real decoder, e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # real impl
        return {"width": img.width, "height": img.height, ...}

    Raises nothing here by design — a real implementation should raise
    and let the caller quarantine undecodable rows.
    """
    digest = hashlib.sha1(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "width": 16 + int(digest[:4], 16) % 4080,  # fake 16..4095 px
        "height": 16 + int(digest[4:8], 16) % 4080,
        "checksum": digest[:16],
    }


def decode_media(df: DataFrame, id_col: str = "doc_id", media_col: str = "media",
                 media_type: str = "image") -> DataFrame:
    """Decode an opaque binary column into typed media metadata.

    1 row in -> 1 row out; runs as mapInPandas so decode never holds
    more than one Arrow batch of media bytes in memory per task.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_bytes(bytes(b)) for b in pdf[media_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "media_type": media_type,
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
        "doc_id",
        "width",
        "height",
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
