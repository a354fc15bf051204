"""Multimodal column plumbing (driver mandate).

Media (image/audio/video) are opaque ``binary`` columns plus typed
metadata. Decode is REAL for the two container formats that need no
codec libraries — uncompressed 24/32-bit BMP and binary PPM (P6), both
parsed by pure-Python header/pixel readers below — and a deterministic
fake for everything else (the sandbox has no JPEG/PNG/video codecs).
``decode_features`` sniffs magic bytes per blob: ``BM`` → BMP parse,
``P6`` → PPM parse, anything else → the fake. Validation is strict
(header fields must be self-consistent with the blob length), so text
blobs that merely *start* with the magic fall through to the fake path
rather than mis-parsing.

Real-codec swap-in for compressed formats: add a branch in
``_decode_blob`` (e.g. PIL/torchvision) — partitioning, batch shape and
schema all stay identical.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
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
    """Deterministic stand-in for formats the sandbox cannot decode.

    Derives stable "decoded" properties from the raw bytes so the
    distributed plumbing (batching, schema, determinism) is testable for
    arbitrary blobs. Real formats (BMP/PPM) never reach this: they are
    parsed for actual pixel data by the decoders below.
    """
    n = len(blob)
    width = n % 640 + 1
    height = n % 480 + 1
    mean_byte = (sum(blob) / n) if n else 0.0
    n_frames = n % 24 + 1
    return width, height, n, mean_byte, n_frames


# --------------------------------------------------------------------------
# Real pure-Python codecs: uncompressed BMP (24/32-bit) and binary PPM (P6).
# No third-party libraries — just struct over the documented layouts.
# --------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Build a bottom-up, uncompressed 24-bit BMP file.

    ``pixels`` is ``width*height`` single-channel values, row-major from
    the TOP; each becomes an (identical B, G, R) triple. Rows are padded
    to 4-byte boundaries and written bottom-up, per the BMP spec — so a
    decoder that ignores padding or row order produces a wrong mean, and
    the round-trip test below would catch it.
    """
    row_size = (width * 3 + 3) // 4 * 4
    img_size = row_size * height
    file_size = 54 + img_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    pad = b"\x00" * (row_size - width * 3)
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            v = pixels[y * width + x]
            row += bytes((v, v, v))
        rows.append(bytes(row) + pad)
    return header + dib + b"".join(rows)


def _decode_bmp(blob: bytes) -> tuple[int, int, int, float, int] | None:
    """Parse an uncompressed 24/32-bit BMP; None if not a valid one.

    Returns (width, height, n_bytes, mean pixel-channel byte, 1).
    Strict validation (magic, biSize, compression, geometry consistent
    with the blob length) so near-miss text blobs fall back to the fake
    rather than mis-parse.
    """
    if len(blob) < 54 or blob[:2] != b"BM":
        return None
    try:
        offset = struct.unpack_from("<I", blob, 10)[0]
        bi_size = struct.unpack_from("<I", blob, 14)[0]
        if bi_size < 40:
            return None
        width, height = struct.unpack_from("<ii", blob, 18)
        planes, bpp = struct.unpack_from("<HH", blob, 26)
        compression = struct.unpack_from("<I", blob, 30)[0]
    except struct.error:
        return None
    if planes != 1 or compression != 0 or bpp not in (24, 32):
        return None
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0 or width > 1 << 20 or height > 1 << 20:
        return None
    bytes_pp = bpp // 8
    row_size = (width * bytes_pp + 3) // 4 * 4
    if offset + row_size * height > len(blob):
        return None
    del top_down  # row order affects pixel placement, not the mean
    total = 0
    count = 0
    for row_i in range(height):
        base = offset + row_i * row_size
        for x in range(width):
            p = base + x * bytes_pp
            # B, G, R channels (alpha excluded for 32-bit)
            total += blob[p] + blob[p + 1] + blob[p + 2]
            count += 3
    return width, height, len(blob), total / count, 1


def _decode_ppm(blob: bytes) -> tuple[int, int, int, float, int] | None:
    """Parse a binary PPM (P6, maxval ≤ 255); None if not a valid one."""
    if not blob.startswith(b"P6"):
        return None
    # Header: "P6" <ws> width <ws> height <ws> maxval <single ws> pixels.
    # '#' comments may appear between tokens.
    pos = 2
    fields: list[int] = []
    while len(fields) < 3 and pos < len(blob):
        c = blob[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            nl = blob.find(b"\n", pos)
            if nl < 0:
                return None
            pos = nl + 1
        elif c.isdigit():
            end = pos
            while end < len(blob) and blob[end : end + 1].isdigit():
                end += 1
            fields.append(int(blob[pos:end]))
            pos = end
        else:
            return None
    if len(fields) < 3:
        return None
    width, height, maxval = fields
    pos += 1  # the single whitespace after maxval
    if width <= 0 or height <= 0 or not (0 < maxval <= 255):
        return None
    n_px = width * height * 3
    if pos + n_px > len(blob):
        return None
    body = blob[pos : pos + n_px]
    return width, height, len(blob), sum(body) / n_px, 1


def _decode_blob(blob: bytes) -> tuple[int, int, int, float, int]:
    """Sniff-and-decode: real BMP/PPM parse, else the deterministic fake."""
    decoded = _decode_bmp(blob) or _decode_ppm(blob)
    return decoded if decoded is not None else _fake_decode(blob)


def decode_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    ``mapInPandas`` receives whole Arrow batches (not rows), the shape a
    vectorized decoder wants; output schema is declared, so downstream
    Catalyst plans don't change when the real decoder lands.
    Input: columns (doc_id: long, blob: binary).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_decode_blob(b) for b in pdf["blob"]]
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
# End-to-end REAL decode: deterministic pixel pattern → BMP container →
# pixel-parsing decoder, with a DuckDB oracle that recomputes the pattern
# analytically. If the decoder mishandled row padding, the 54-byte header,
# or channel layout, the mean would drift and the oracle would catch it.
# --------------------------------------------------------------------------

_BMP_ORACLE = """
WITH dims AS (
    SELECT doc_id,
           octet_length(encode(text)) % 16 + 1 AS w,
           octet_length(encode(text)) % 12 + 1 AS h
    FROM documents WHERE doc_id % 11 = 0
),
px AS (
    SELECT doc_id, w, h, (x.x * 7 + y.y * 13 + doc_id) % 256 AS v
    FROM dims,
         unnest(generate_series(0, w - 1)) AS x(x),
         unnest(generate_series(0, h - 1)) AS y(y)
)
SELECT doc_id,
       CAST(max(w) AS INTEGER) AS width,
       CAST(max(h) AS INTEGER) AS height,
       CAST(54 + ((max(w) * 3 + 3) // 4) * 4 * max(h) AS BIGINT) AS n_bytes,
       CAST(sum(v) AS DOUBLE) / count(*) AS mean_byte,
       CAST(1 AS INTEGER) AS n_frames
FROM px GROUP BY doc_id
"""


def _pattern_pixels(doc_id: int, w: int, h: int) -> bytes:
    """Deterministic test pattern: v(x, y) = (7x + 13y + doc_id) mod 256."""
    return bytes(
        (x * 7 + y * 13 + doc_id) % 256 for y in range(h) for x in range(w)
    )


@query("multimodal_decode_bmp", oracle=_BMP_ORACLE)
def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: a deterministic pixel pattern is
    packed into actual 24-bit BMP files (row padding, bottom-up rows,
    54-byte header) in one Arrow batch stage, then ``decode_features``
    parses the pixel data back out with the pure-Python BMP reader. The
    oracle recomputes width/height/file-size/mean analytically from the
    pattern — an exact-match proof that real pixel bytes round-trip
    through a real container format.

    Scale shape: two chained narrow ``mapInPandas`` stages, no shuffle;
    dims bounded (≤16×12), so per-row work is constant."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    blob_len = F.length(F.encode("text", "UTF-8"))
    dims = docs.select(
        "doc_id",
        (blob_len % 16 + 1).cast("int").alias("w"),
        (blob_len % 12 + 1).cast("int").alias("h"),
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": [
                        encode_bmp(w, h, _pattern_pixels(d, w, h))
                        for d, w, h in zip(pdf["doc_id"], pdf["w"], pdf["h"])
                    ],
                }
            )

    blobs = dims.mapInPandas(
        pack,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("blob", BinaryType()),
            ]
        ),
    )
    return decode_features(blobs)


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
