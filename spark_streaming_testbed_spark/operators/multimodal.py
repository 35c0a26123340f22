"""Multimodal-column plumbing (SURVEY.md §7 M7).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata. The container has no image/audio libraries, so full *raster*
decoding stays stubbed (``NotImplementedError`` unless the deterministic
fake decoder is requested) — but header-level decoding is REAL: documents
are encoded as genuine PNG files by a pure-stdlib writer and
width/height/bit-depth/color-type/channels are parsed back out of the
actual IHDR bytes, oracle-checked end to end. The Spark-side plumbing is
real and tested: schema, Arrow batch shape, ``mapInPandas`` signature,
partition behavior.

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
    "doc_id long, mime string, width int, height int, bit_depth int, "
    "color_type int, channels int"
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"
# deterministic construction formulas -- the DuckDB oracle recomputes
# these directly from the documents columns, closing the encode ->
# binary -> header-parse roundtrip
PNG_W_MOD, PNG_H_MOD = 64, 48


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def png_encode(width: int, height: int, color_type: int, src: bytes) -> bytes:
    """Minimal pure-stdlib PNG writer (real format: signature, IHDR,
    zlib-deflated filtered scanlines in IDAT, IEND). ``color_type`` 0 =
    8-bit grayscale (1 channel), 2 = 8-bit truecolor RGB (3 channels);
    pixel bytes are ``src`` cropped/cycled to fill the raster."""
    import struct

    channels = {0: 1, 2: 3}[color_type]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    need = width * height * channels
    body = ((src or b"\x00") * (need // max(len(src), 1) + 1))[:need]
    stride = width * channels
    raw = b"".join(
        b"\x00" + body[r * stride : (r + 1) * stride] for r in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def png_decode_header(payload: bytes) -> tuple[int, int, int, int, int]:
    """REAL header decode from the actual bytes: validates the PNG
    signature and the IHDR chunk tag, then parses (width, height,
    bit_depth, color_type, channels) big-endian from the wire format.
    Full raster decode would additionally need zlib + per-filter
    reconstruction; header parsing needs no image library at all."""
    import struct

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    if payload[12:16] != b"IHDR":
        raise ValueError("corrupt PNG: first chunk is not IHDR")
    width, height = struct.unpack(">II", payload[16:24])
    bit_depth, color_type = payload[24], payload[25]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    return width, height, bit_depth, color_type, channels


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """Raster-decode stub. Full pixel decoding needs an image library
    that is not in this container -- STUBBED by contract (header-level
    decoding is real: :func:`png_decode_header`). The deterministic fake
    derives a (width, height) from payload bytes so pipelines are
    testable."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "environment; pass fake=True for the deterministic test decoder"
        )
    h = zlib.crc32(payload)
    return (h % 640) + 1, ((h >> 16) % 480) + 1


def _build_png_assets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode each document as a real (tiny) PNG: dimensions derive from
    the document columns, color type alternates grayscale/RGB by doc_id
    parity, pixel bytes come from the text."""
    for pdf in batches:
        payloads = [
            png_encode(
                int(n_chars) % PNG_W_MOD + 1,
                int(doc_id) % PNG_H_MOD + 1,
                0 if int(doc_id) % 2 == 0 else 2,
                str(text).encode("utf-8"),
            )
            for doc_id, n_chars, text in zip(
                pdf["doc_id"], pdf["n_chars"], pdf["text"]
            )
        ]
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


def png_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> real PNG binary payloads (Arrow-batched encode)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "text"
    )
    return docs.mapInPandas(_build_png_assets, schema="doc_id long, payload binary")


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [png_decode_header(p) for p in pdf["payload"]]
        mimes = [
            "image/png" if bytes(p[:8]) == PNG_SIG else "application/octet-stream"
            for p in pdf["payload"]
        ]
        out = pd.DataFrame(
            feats, columns=["width", "height", "bit_depth", "color_type", "channels"]
        )
        out.insert(0, "mime", mimes)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        for c in ("width", "height", "bit_depth", "color_type", "channels"):
            out[c] = out[c].astype("int32")
        yield out


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-CHECKED multimodal decode roundtrip: documents are encoded
    as real PNG files (pure-stdlib writer), then ``_extract_features``
    parses width/height/bit-depth/color-type/channels back out of the
    actual header bytes (big-endian IHDR fields -- no image library
    needed) plus signature-sniffed mime, Arrow-batched end to end. The
    DuckDB twin recomputes the expected dimensions from the construction
    formulas, closing the encode -> binary -> decode loop. Payload bytes
    never leave the executor; both hops are ``mapInPandas`` over binary
    columns -- the shape a real (library-backed) raster decode would
    use at 100 TB."""
    assets = png_assets(spark, sf_dir)
    return assets.mapInPandas(_extract_features, schema=FEATURE_SCHEMA).orderBy(
        "doc_id"
    )


MULTIMODAL_FEATURES_ORACLE = f"""
SELECT doc_id,
       'image/png' AS mime,
       CAST(n_chars % {PNG_W_MOD} + 1 AS INT) AS width,
       CAST(doc_id % {PNG_H_MOD} + 1 AS INT) AS height,
       8 AS bit_depth,
       CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 2 END AS color_type,
       CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS channels
FROM documents ORDER BY doc_id
"""


def binary_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model documents as multimodal assets: payload = utf-8 bytes of the
    text (stand-in for arbitrary opaque bytes), plus a typed metadata
    struct. (:func:`png_assets` is the real-format sibling.)"""
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
    "multimodal_frame_sample": multimodal_frame_sample,}

# ---------------------------------------------------------------------------
# Payload content dedup: real zlib decode -> raster fingerprint
# ---------------------------------------------------------------------------

#: content-fingerprint prefix length (pre-codec pixel bytes)
FP_PREFIX = 256


def _fingerprint_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode: zlib-decompress each PNG's IDAT, strip the per-row
    filter bytes, and hash (color_type | first FP_PREFIX raster bytes).
    The fingerprint is pre-codec pixel content, so re-encodes of the
    same content collide regardless of raster dimensions."""
    import struct

    for pdf in batches:
        fps = []
        for p in pdf["payload"]:
            p = bytes(p)
            width, height = struct.unpack(">II", p[16:24])
            color_type = p[25]
            channels = {0: 1, 2: 3}[color_type]
            # walk chunks to the IDAT payload (single IDAT by our writer)
            off, idat = 8, b""
            while off < len(p):
                (ln,) = struct.unpack(">I", p[off : off + 4])
                tag = p[off + 4 : off + 8]
                if tag == b"IDAT":
                    idat = p[off + 8 : off + 8 + ln]
                off += 12 + ln
            raw = zlib.decompress(idat)
            stride = width * channels
            body = b"".join(
                raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)]
                for r in range(height)
            )
            key = f"{color_type}|" + body[:FP_PREFIX].decode("ascii")
            fps.append(hashlib.md5(key.encode("ascii")).hexdigest())
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "fp": fps})


def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-CHECKED multimodal content dedup: assets are REALLY
    decoded (zlib IDAT decompression + filter-byte stripping — pure
    stdlib, no image library) and grouped by a pre-codec content
    fingerprint (color type + first 256 raster bytes); duplicate groups
    report size and the keep-min keeper. The DuckDB twin recomputes the
    fingerprint from the construction formulas, closing the encode →
    compress → decompress → hash loop across engines.

    Scale shape: payload bytes never leave the executor (Arrow-batched
    ``mapInPandas`` emits 16-byte fingerprints); the dedup itself is a
    linear hash group-by on the fingerprint — the same shape as text
    exact-dedup, which is how production image dedup runs at 100 TB
    (fingerprint first, group second, bytes never shuffled)."""
    assets = png_assets(spark, sf_dir)
    fps = assets.mapInPandas(
        _fingerprint_payloads, schema="doc_id long, fp string"
    )
    return (
        fps.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .where(F.col("n_assets") > 1)
        .orderBy("fp")
    )


MULTIMODAL_PAYLOAD_DEDUP_ORACLE = f"""
WITH fp AS (
  SELECT doc_id,
         md5(concat(
           CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 2 END AS VARCHAR),
           '|',
           substr(
             repeat(text,
                    CAST({FP_PREFIX} / length(text) + 1 AS INTEGER)),
             1,
             least({FP_PREFIX},
                   (n_chars % {PNG_W_MOD} + 1)
                   * (doc_id % {PNG_H_MOD} + 1)
                   * (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END)))))
           AS fp
  FROM documents)
SELECT fp, count(*) AS n_assets,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
FROM fp
GROUP BY fp
HAVING count(*) > 1
ORDER BY fp
"""


MULTIMODAL_ORACLES = {
    "multimodal_meta": MULTIMODAL_META_ORACLE,
    "multimodal_frame_sample": MULTIMODAL_FRAME_SAMPLE_ORACLE,
    "multimodal_features": MULTIMODAL_FEATURES_ORACLE,
    "multimodal_payload_dedup": MULTIMODAL_PAYLOAD_DEDUP_ORACLE,
}
MULTIMODAL_QUERIES["multimodal_payload_dedup"] = multimodal_payload_dedup
