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


def png_decode_pixels(payload: bytes):
    """REAL raster decode for 8-bit non-interlaced grayscale/RGB/RGBA
    PNGs — pure stdlib zlib + numpy, no image library: concatenates the
    IDAT chunks, inflates, then reconstructs scanlines through all five
    PNG filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6). Returns a
    ``(height, width, channels)`` uint8 array.

    This is the honest pixel path for the formats this engine's own
    encoder (and most ML training corpora's PNG masks/thumbnails) use;
    palette and 16-bit images still raise, loudly."""
    import struct

    import numpy as np

    width, height, bit_depth, color_type, channels = png_decode_header(
        payload
    )
    if bit_depth != 8 or color_type not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"png_decode_pixels handles 8-bit gray/RGB/alpha PNGs; got "
            f"bit_depth={bit_depth} color_type={color_type}"
        )
    if payload[28] != 0:
        raise NotImplementedError("interlaced PNGs not supported")
    # walk chunks, concatenating IDAT payloads
    idat = bytearray()
    pos = 8
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        if tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("corrupt PNG: filtered data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels  # bytes per pixel at bit depth 8
    for r in range(height):
        line = raw[r * (stride + 1) : (r + 1) * (stride + 1)]
        ftype, data = line[0], np.frombuffer(
            line[1:], dtype=np.uint8
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = data
        elif ftype == 2:  # Up
            cur = (data + prev) & 0xFF
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth need the in-progress left neighbor —
            # sequential per row, vectorless by design (rows are short;
            # the parallelism axis at scale is images, not scanlines)
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0  # left
                b = prev[i]  # up
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[i - bpp] if i >= bpp else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                cur[i] = (data[i] + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, channels)


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """Image decode: PNG payloads get a REAL raster decode
    (:func:`png_decode_pixels` — zlib + numpy filter reconstruction, no
    image library) and return their true (width, height); other formats
    (JPEG etc.) would need codec libraries this container lacks and
    raise, unless the deterministic fake decoder is requested for
    pipeline testing."""
    if payload[:8] == PNG_SIG:
        arr = png_decode_pixels(payload)
        return arr.shape[1], arr.shape[0]
    if not fake:
        raise NotImplementedError(
            "non-PNG image decoding requires codec libraries not present "
            "in this environment; pass fake=True for the deterministic "
            "test decoder"
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


def png_assets(spark: SparkSession, sf_dir: str,
               fan: bool = False) -> DataFrame:
    """documents -> real PNG binary payloads (Arrow-batched encode).

    ``fan=True`` widens the narrow local documents scan before the
    encode (r12 A/B over the five consumers: only the full pixel-level
    decode is CPU-heavy enough to win, 1.8 -> 1.6 s at sf0.1; the
    header/meta consumers lose the text-payload exchange).

    No content, no asset: a NULL-text document is dropped rather than
    encoded — ``str(None)`` used to rasterize the literal characters
    "None" into pixel bytes, a silent fabrication the r9 nulls sweep
    caught when the fingerprint oracle (which derives from ``text``)
    disagreed. Every png-family oracle pins the same WHERE."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "n_chars", "text")
    )
    if fan:
        from ..session import fan_out

        docs = fan_out(docs, "doc_id")
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
FROM documents WHERE text IS NOT NULL ORDER BY doc_id
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
    """Image resize: PNG payloads get a REAL nearest-neighbor resize —
    decode the raster (:func:`png_decode_pixels`), index-remap with
    numpy, re-encode through the same writer; gray/RGB rasters
    roundtrip losslessly. Non-PNG formats raise unless the deterministic
    fake resizer (crop/cycle to width*height bytes) is requested."""
    if payload[:8] == PNG_SIG:
        import numpy as np

        arr = png_decode_pixels(payload)
        h, w, c = arr.shape
        if c not in (1, 3):
            raise NotImplementedError(
                "resize re-encode supports gray/RGB (alpha would need an "
                "encoder color type this writer doesn't emit)"
            )
        rows = (np.arange(height) * h // height).clip(0, h - 1)
        cols = (np.arange(width) * w // width).clip(0, w - 1)
        resized = arr[rows][:, cols]
        return png_encode(
            width, height, 0 if c == 1 else 2, resized.tobytes()
        )
    if not fake:
        raise NotImplementedError(
            "non-PNG resize requires codec libraries not present here; "
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
    assets = (
        binary_assets(spark, sf_dir)
        .select("doc_id", "payload")
        # no content, no frames: a NULL payload (NULL-text doc in a
        # malformed feed) has nothing to sample — pinned in the
        # oracle's WHERE (r9 nulls sweep)
        .where(F.col("payload").isNotNull())
    )
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
  FROM documents WHERE text IS NOT NULL),
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
  FROM documents WHERE text IS NOT NULL)
SELECT fp, count(*) AS n_assets,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
FROM fp
GROUP BY fp
HAVING count(*) > 1
ORDER BY fp
"""


PIXEL_STATS_SCHEMA = (
    "doc_id long, n_bytes long, px_sum long, px_mean_milli long"
)


def _pixel_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL raster statistics: inflate + unfilter every PNG
    (:func:`png_decode_pixels`) and reduce the pixel bytes to integer
    (count, sum, mean‰) — the shape of any per-image feature extraction
    at scale: payload bytes stay executor-local, only fixed-width
    numbers come out."""
    for pdf in batches:
        ids, n_bytes, sums = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = png_decode_pixels(bytes(payload))
            ids.append(doc_id)
            n_bytes.append(arr.size)
            sums.append(int(arr.astype("int64").sum()))
        out = pd.DataFrame({
            "doc_id": ids,
            "n_bytes": n_bytes,
            "px_sum": sums,
        })
        out["px_mean_milli"] = out["px_sum"] * 1000 // out["n_bytes"]
        yield out


def multimodal_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-CHECKED pixel-level decode: documents are encoded as real
    PNGs, then every raster is zlib-inflated and filter-reconstructed
    back to pixels (no image library — ``png_decode_pixels``) and
    reduced to integer byte statistics. The DuckDB twin recomputes the
    same sums from the construction formulas (pixel bytes are the
    utf-8 text cycled to width·height·channels), so a single wrong
    pixel anywhere in the decode path breaks the hash. Closes the
    encode → compress → filter → decode loop at the PIXEL level, not
    just the header."""
    assets = png_assets(spark, sf_dir, fan=True)
    return assets.mapInPandas(
        _pixel_stats, schema=PIXEL_STATS_SCHEMA
    ).orderBy("doc_id")


MULTIMODAL_PIXEL_STATS_ORACLE = f"""
WITH dims AS (
  SELECT doc_id, text,
         -- guard (ADVICE r6): the bytes CTE below walks CHARACTER
         -- positions with ascii(substr(..)) up to the OCTET length and
         -- inner-joins the sums, which silently diverges from the
         -- engine on multibyte or empty text; the committed corpora
         -- are all-ASCII and non-empty, and this makes a future
         -- generator change fail LOUDLY instead of hash-mismatching
         CASE WHEN octet_length(encode(text)) = length(text)
                   AND length(text) > 0
              THEN octet_length(encode(text))
              ELSE CAST(error('pixel-stats oracle requires non-empty '
                              || 'ASCII text (doc_id ' || doc_id || ')')
                        AS BIGINT)
         END AS len,
         (n_chars % {PNG_W_MOD} + 1)
         * (doc_id % {PNG_H_MOD} + 1)
         * (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END) AS need
  -- png_assets drops NULL-text docs (no content, no asset)
  FROM documents WHERE text IS NOT NULL),
bytes AS (
  SELECT d.doc_id, t.i, ascii(substr(d.text, CAST(t.i AS INTEGER), 1)) AS bv
  FROM dims d, unnest(range(1, d.len + 1)) AS t(i)),
sums AS (
  SELECT b.doc_id,
         CAST(sum(b.bv) AS BIGINT) AS full_sum,
         CAST(sum(b.bv) FILTER (WHERE b.i <= d.need % d.len)
              AS BIGINT) AS rem_sum
  FROM bytes b JOIN dims d USING (doc_id)
  GROUP BY b.doc_id)
SELECT d.doc_id,
       CAST(d.need AS BIGINT) AS n_bytes,
       CAST((d.need // d.len) * s.full_sum
            + coalesce(s.rem_sum, 0) AS BIGINT) AS px_sum,
       CAST(((d.need // d.len) * s.full_sum + coalesce(s.rem_sum, 0))
            * 1000 // d.need AS BIGINT) AS px_mean_milli
FROM dims d JOIN sums s USING (doc_id)
ORDER BY d.doc_id
"""


MULTIMODAL_ORACLES = {
    "multimodal_meta": MULTIMODAL_META_ORACLE,
    "multimodal_frame_sample": MULTIMODAL_FRAME_SAMPLE_ORACLE,
    "multimodal_features": MULTIMODAL_FEATURES_ORACLE,
    "multimodal_payload_dedup": MULTIMODAL_PAYLOAD_DEDUP_ORACLE,
    "multimodal_pixel_stats": MULTIMODAL_PIXEL_STATS_ORACLE,
}
MULTIMODAL_QUERIES["multimodal_payload_dedup"] = multimodal_payload_dedup
MULTIMODAL_QUERIES["multimodal_pixel_stats"] = multimodal_pixel_stats
