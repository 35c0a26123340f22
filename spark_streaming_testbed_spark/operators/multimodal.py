"""Multimodal-column plumbing (SURVEY.md §7 M7).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata. The container has no image/audio libraries, so the *decode*
step is stubbed (``NotImplementedError`` unless the deterministic fake
decoder is requested) — but the Spark-side plumbing is real and tested:
schema, Arrow batch shape, ``mapInPandas`` signature, partition behavior.

Scale design: payload bytes never leave the executor; feature extraction
is an Arrow-batched ``mapInPandas`` over binary columns (the only
defensible place for Python in this engine), emitting small fixed-width
feature rows.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

FEATURE_SCHEMA = (
    "doc_id long, mime string, byte_len int, crc32 long, sha1_8 string, "
    "fake_width int, fake_height int"
)


def binary_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model documents as multimodal assets: payload = utf-8 bytes of the
    text (stand-in for image bytes), plus a typed metadata struct."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.col("n_chars").cast("int").alias("declared_len"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """Decode stub. Real decoding needs an image library that is not in
    this container — STUBBED by contract. The deterministic fake derives a
    (width, height) from payload bytes so pipelines are testable."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )
    h = zlib.crc32(payload)
    return (h % 640) + 1, ((h >> 16) % 480) + 1


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "byte_len": payloads.map(len).astype("int32"),
                "crc32": payloads.map(zlib.crc32).astype("int64"),
                "sha1_8": payloads.map(
                    lambda b: hashlib.sha1(b).hexdigest()[:8]
                ),
                "fake_width": payloads.map(
                    lambda b: decode_image(b, fake=True)[0]
                ).astype("int32"),
                "fake_height": payloads.map(
                    lambda b: decode_image(b, fake=True)[1]
                ).astype("int32"),
            }
        )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas``. Rows-only check for the pandas-side features; the
    byte-accounting twin ``multimodal_meta`` is oracle-checked."""
    assets = binary_assets(spark, sf_dir).select(
        "doc_id", F.col("meta.mime").alias("mime"), "payload"
    )
    return assets.mapInPandas(_extract_features, schema=FEATURE_SCHEMA).orderBy(
        "doc_id"
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte accounting on the binary column, all JVM-side: payload length
    vs declared metadata length, md5 of the payload bytes."""
    assets = binary_assets(spark, sf_dir)
    return (
        assets.select(
            "doc_id",
            F.col("meta.mime").alias("mime"),
            F.length("payload").alias("byte_len"),
            (F.length("payload") == F.col("meta.declared_len")).alias("len_matches"),
            F.md5("payload").alias("payload_md5"),
        )
        .orderBy("doc_id")
    )


MULTIMODAL_META_ORACLE = """
SELECT doc_id,
       'image/fake' AS mime,
       octet_length(encode(text)) AS byte_len,
       octet_length(encode(text)) = n_chars AS len_matches,
       md5(text) AS payload_md5
FROM documents ORDER BY doc_id
"""

def resize_image(payload: bytes, width: int, height: int,
                 fake: bool = False) -> bytes:
    """Resize stub (no image libs in this container). The deterministic
    fake re-chunks the payload to width*height bytes (crop/pad) so
    downstream batch shapes are real."""
    if not fake:
        raise NotImplementedError(
            "image resize requires an image library not present here; "
            "pass fake=True for the deterministic test resizer"
        )
    need = width * height
    body = (payload * (need // max(len(payload), 1) + 1))[:need]
    return body


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_bytes binary, frame_len int, "
    "frame_md5 string"
)
FRAMES_PER_ASSET = 4


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Video-style frame sampling: emit FRAMES_PER_ASSET evenly-spaced
    byte slices per asset (1 row in → N rows out, the explode-shaped
    mapInPandas). Checksums are md5 so the DuckDB oracle can recompute
    them on the equivalent text slices."""
    for pdf in batches:
        rows: dict[str, list] = {
            "doc_id": [], "frame_idx": [], "frame_bytes": [],
            "frame_len": [], "frame_md5": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            step = max(n // FRAMES_PER_ASSET, 1)
            for i in range(FRAMES_PER_ASSET):
                frame = payload[i * step: i * step + step]
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(i)
                rows["frame_bytes"].append(frame)
                rows["frame_len"].append(len(frame))
                rows["frame_md5"].append(hashlib.md5(frame).hexdigest())
        out = pd.DataFrame(rows)
        out["frame_idx"] = out["frame_idx"].astype("int32")
        out["frame_len"] = out["frame_len"].astype("int32")
        yield out


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-CHECKED frame-sampling pipeline over binary assets: 1 asset
    → N frame rows with per-frame checksums, Arrow-batched. Payloads are
    the docs' utf-8 bytes (all-ASCII corpus), so the DuckDB twin slices
    the text with substr and md5s each slice."""
    assets = binary_assets(spark, sf_dir).select("doc_id", "payload")
    return (
        assets.mapInPandas(_sample_frames, schema=FRAME_SCHEMA)
        .select("doc_id", "frame_idx", "frame_len", "frame_md5")
        .orderBy("doc_id", "frame_idx")
    )


MULTIMODAL_FRAME_SAMPLE_ORACLE = f"""
WITH f AS (
  SELECT doc_id, text,
         greatest(octet_length(encode(text)) // {FRAMES_PER_ASSET}, 1) AS step,
         octet_length(encode(text)) AS n
  FROM documents),
frames AS (
  SELECT doc_id, CAST(i AS INT) AS frame_idx,
         CAST(least(step, greatest(n - i * step, 0)) AS INT) AS frame_len,
         md5(substr(text, CAST(i * step AS INT) + 1, CAST(step AS INT)))
           AS frame_md5
  FROM f, (SELECT unnest(range({FRAMES_PER_ASSET})) AS i))
SELECT doc_id, frame_idx, frame_len, frame_md5
FROM frames ORDER BY doc_id, frame_idx
"""


MULTIMODAL_QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
}

MULTIMODAL_ORACLES = {
    "multimodal_meta": MULTIMODAL_META_ORACLE,
    "multimodal_frame_sample": MULTIMODAL_FRAME_SAMPLE_ORACLE,
    # multimodal_features: rows-only (pandas-side features; decode stubbed)
}
