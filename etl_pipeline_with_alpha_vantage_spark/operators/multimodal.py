"""Multimodal column plumbing (driver mandate).

Media (image/audio/video) are opaque ``binary`` columns plus typed
metadata. The container has no codec libraries, so the *decode* itself is
a deterministic stub — but every Spark-side piece is real and tested:
binary column construction, metadata projection (oracle-checked), and an
Arrow-batched ``mapInPandas`` feature extractor with an explicit output
schema (the exact shape a real image decoder drops into).

Real-decoder swap-in: replace ``_fake_decode`` with e.g. PIL/torchvision
calls inside the same iterator — partitioning, batch shape and schema all
stay identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..catalog import table
from ..registry import query

_META_ORACLE = """
SELECT
    doc_id,
    CAST(octet_length(encode(text)) AS BIGINT)           AS byte_len,
    sha256(text)                                         AS content_sha,
    CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS fake_width,
    CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS fake_height,
    CAST((octet_length(encode(text)) % 640 + 1)
       * (octet_length(encode(text)) % 480 + 1) AS BIGINT) AS n_pixels
FROM documents
"""


@query("multimodal_metadata", oracle=_META_ORACLE)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata projection: text → binary blob (stand-in for
    image bytes) → typed metadata (size, content hash, synthetic dims).
    All JVM-side; the sha256 is oracle-checked byte-for-byte."""
    docs = table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    byte_len = F.length(blob).cast("long")
    w = (byte_len % 640 + 1).cast("long")
    h = (byte_len % 480 + 1).cast("long")
    return docs.select(
        "doc_id",
        byte_len.alias("byte_len"),
        F.sha2(blob, 256).alias("content_sha"),
        w.alias("fake_width"),
        h.alias("fake_height"),
        (w * h).alias("n_pixels"),
    )


DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _fake_decode(blob: bytes) -> tuple[int, int, int, float, int]:
    """Deterministic stand-in for a real media decoder.

    A real implementation raises NotImplementedError without codec libs;
    this fake derives stable "decoded" properties from the bytes so the
    distributed plumbing (batching, schema, determinism) is testable.
    """
    n = len(blob)
    width = n % 640 + 1
    height = n % 480 + 1
    mean_byte = (sum(blob) / n) if n else 0.0
    n_frames = n % 24 + 1
    return width, height, n, mean_byte, n_frames


def decode_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    ``mapInPandas`` receives whole Arrow batches (not rows), the shape a
    vectorized decoder wants; output schema is declared, so downstream
    Catalyst plans don't change when the real decoder lands.
    Input: columns (doc_id: long, blob: binary).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_fake_decode(b) for b in pdf["blob"]]
            out = pd.DataFrame(
                rows, columns=["width", "height", "n_bytes", "mean_byte", "n_frames"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return blobs.mapInPandas(extract, DECODE_SCHEMA)


_DECODE_ORACLE = """
SELECT
    doc_id,
    CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
    CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
    CAST(octet_length(encode(text)) AS BIGINT)            AS n_bytes,
    CAST(list_sum([CAST(ascii(c) AS BIGINT) for c in string_split(text, '')])
         AS DOUBLE) / octet_length(encode(text))          AS mean_byte,
    CAST(octet_length(encode(text)) % 24 + 1 AS INTEGER)  AS n_frames
FROM documents
"""


@query("multimodal_decode", oracle=_DECODE_ORACLE)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path end-to-end: build binary blobs from
    text, extract features in Arrow batches. The corpus is ASCII, so the
    DuckDB oracle can recompute the fake decoder's outputs exactly
    (integer byte-sum → one double division)."""
    # No spread(): the fake decode is microseconds per row, so the Arrow
    # transfer dominates and re-sharding tiny blobs costs more than the
    # parallelism returns. A real image/video decoder (ms per row) would
    # want spread() here.
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )
    return decode_features(docs)


_FRAME_ORACLE = """
SELECT
    doc_id,
    CAST(octet_length(encode(text)) % 24 + 1 AS INTEGER) AS n_frames,
    CAST(f.frame_idx AS INTEGER) AS frame_idx
FROM documents,
     unnest(generate_series(0, octet_length(encode(text)) % 24, 4))
         AS f(frame_idx)
WHERE doc_id % 3 = 0
"""


@query("multimodal_frame_sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling plumbing: derive the frame count from the
    blob ("decoded" metadata), emit every 4th frame index via
    sequence+explode — the row-multiplying shape a real frame extractor
    plugs into (the per-frame decode itself would be the mapInPandas stub
    of decode_features)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    n_frames = (F.length(F.encode("text", "UTF-8")) % 24 + 1).cast("int")
    return docs.select(
        "doc_id",
        n_frames.alias("n_frames"),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(4))).alias("idx"),
    ).select(
        "doc_id", "n_frames", F.col("idx").cast("int").alias("frame_idx")
    )


# --------------------------------------------------------------------------
# Resize plumbing (aspect-preserving fit into 224×224)
# --------------------------------------------------------------------------

_TARGET = 224

_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("dst_w", IntegerType()),
        StructField("dst_h", IntegerType()),
        StructField("scale_pct", DoubleType()),
    ]
)


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Aspect-preserving fit: scale = TARGET / max(w, h), floor dims, min 1.
    A real implementation calls PIL.Image.resize on the decoded pixels in
    this same loop; the geometry (and the Spark plumbing) is identical."""
    for pdf in batches:
        w = pdf["src_w"]
        h = pdf["src_h"]
        long_side = w.where(w >= h, h)
        dst_w = (w * _TARGET // long_side).clip(lower=1).astype("int32")
        dst_h = (h * _TARGET // long_side).clip(lower=1).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "src_w": w,
                "src_h": h,
                "dst_w": dst_w,
                "dst_h": dst_h,
                "scale_pct": (dst_w * dst_h * 100.0) / (w * h),
            }
        )


_RESIZE_ORACLE = f"""
WITH dims AS (
    SELECT doc_id,
           CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS src_w,
           CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS src_h
    FROM documents WHERE doc_id % 7 = 0
)
SELECT
    doc_id, src_w, src_h,
    CAST(greatest(src_w * {_TARGET} // greatest(src_w, src_h), 1) AS INTEGER) AS dst_w,
    CAST(greatest(src_h * {_TARGET} // greatest(src_w, src_h), 1) AS INTEGER) AS dst_h,
    CAST(greatest(src_w * {_TARGET} // greatest(src_w, src_h), 1)
       * greatest(src_h * {_TARGET} // greatest(src_w, src_h), 1) * 100.0
       / (src_w * src_h) AS DOUBLE) AS scale_pct
FROM dims
"""


@query("multimodal_resize", oracle=_RESIZE_ORACLE)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing: synthetic source dims from the blob (same
    derivation as multimodal_metadata), aspect-preserving fit into
    224×224 computed per Arrow batch in mapInPandas — the exact batch
    shape a PIL/torchvision resize drops into. Integer geometry, so the
    oracle reproduces it exactly."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    blob_len = F.length(F.encode("text", "UTF-8"))
    dims = docs.select(
        "doc_id",
        (blob_len % 640 + 1).cast("int").alias("src_w"),
        (blob_len % 480 + 1).cast("int").alias("src_h"),
    )
    return dims.mapInPandas(_resize_batch, _RESIZE_SCHEMA)
