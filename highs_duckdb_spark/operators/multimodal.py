"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched pandas UDFs.

Decode is REAL where the format needs no codec library: m02 round-trips
genuine 24-bit uncompressed BMP files (struct-packed headers, bottom-up
BGR rows, 4-byte row padding) and m04 genuine RIFF/WAVE PCM16 files
(chunk-walking parser, validated against the stdlib ``wave`` reader in
pytest). Pixel/sample content is derived deterministically from each
document's text bytes, so the DuckDB oracle can verify the whole
synthesize→encode→decode→feature loop end-to-end from the source column —
a decoder bug anywhere breaks the hash match.

Container-metadata ops (m01/m03/m06–m08) use a simpler fake container
format — real byte-level header work with a checkable answer::

    bytes 0-3   magic  b"HDSB"
    bytes 4-7   width  (big-endian uint32, deterministic from doc_id)
    bytes 8-11  height (big-endian uint32)
    bytes 12-   payload (utf-8 text)
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.functions.presentation import present_sorted
from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.session import ensure_shipped, load_table

MAGIC = b"HDSB"


def synthesize_blobs(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media_type, blob binary) with the fake header."""
    width = (F.col("doc_id") % 640 + 16).cast("int")
    height = (F.col("doc_id") % 480 + 16).cast("int")
    header = F.concat(
        F.lit(MAGIC),
        _be_uint32(width),
        _be_uint32(height),
        F.encode(F.col("text"), "UTF-8"),
    )
    media = F.when(F.col("doc_id") % 3 == 0, "image").when(F.col("doc_id") % 3 == 1, "audio").otherwise("video")
    return docs.select("doc_id", media.alias("media_type"), header.alias("blob"))


def _be_uint32(col):
    """Big-endian 4-byte encoding of an int column, JVM-side."""
    return F.concat(
        _byte(col, 24), _byte(col, 16), _byte(col, 8), _byte(col, 0)
    )


def _byte(col, shift):
    b = F.shiftrightunsigned(col.cast("bigint"), shift) % F.lit(256).cast("bigint")
    # unhex of 2 hex chars → single byte
    return F.unhex(F.lpad(F.hex(b), 2, "0"))


def _parse_header_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: byte-level metadata extraction per Arrow batch."""
    for pdf in it:
        out = {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "valid_magic": [],
            "width": [],
            "height": [],
            "payload_bytes": [],
        }
        for blob in pdf["blob"]:
            b = bytes(blob)
            ok = b[:4] == MAGIC
            out["valid_magic"].append(ok)
            if ok:
                w, h = struct.unpack(">II", b[4:12])
            else:
                w = h = 0
            out["width"].append(w)
            out["height"].append(h)
            out["payload_bytes"].append(len(b) - 12 if ok else len(b))
        yield pd.DataFrame(out)


@register(
    "m01_binary_metadata",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
           true AS valid_magic,
           CAST(doc_id % 640 + 16 AS BIGINT) AS width,
           CAST(doc_id % 480 + 16 AS BIGINT) AS height,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
    FROM documents
    ORDER BY doc_id
    """,
    category="multimodal",
    doc=(
        "Binary metadata extraction: pack text into a fake container format "
        "(magic + BE dims + payload) JVM-side, then parse the header back "
        "byte-for-byte in a mapInPandas kernel. Oracle recomputes the "
        "expected metadata from the source columns."
    ),
)
def m01_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_shipped(spark)
    docs = load_table(spark, "documents", sf_dir)
    blobs = synthesize_blobs(docs)
    schema = (
        "doc_id long, media_type string, valid_magic boolean, width long, "
        "height long, payload_bytes long"
    )
    return blobs.mapInPandas(_parse_header_batch, schema).orderBy("doc_id")


# --- m02: REAL BMP encode → decode → nearest-neighbor thumbnail --------------
# Image dims kept small (w ≤ 31, h ≤ 23) so the oracle's per-pixel unnest
# stays tiny; pixel (x, y) channel c is text byte ((y·w + x)·3 + c) mod n,
# so DuckDB can recompute the resized checksum straight from the text.

BMP_THUMB = 16


def _bmp_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 24 + 8, doc_id % 16 + 8


def _bmp_pixels_from_text(text_bytes: bytes, w: int, h: int) -> bytes:
    """Deterministic RGB pixel array (row-major, top-down) from text bytes.

    np.resize repeats the source cyclically, which IS byte i % n — one
    vectorized copy instead of a per-pixel-byte Python generator."""
    return np.resize(np.frombuffer(text_bytes, dtype=np.uint8), w * h * 3).tobytes()


def encode_bmp(w: int, h: int, pix: bytes) -> bytes:
    """A genuine 24-bit uncompressed BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER, bottom-up rows, BGR byte order, rows padded to 4
    bytes — openable by any image viewer."""
    row_size = (3 * w + 3) // 4 * 4
    img_size = row_size * h
    off = 14 + 40
    hdr = (
        b"BM"
        + struct.pack("<IHHI", off + img_size, 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    )
    rgb = np.frombuffer(pix, dtype=np.uint8)[: w * h * 3].reshape(h, w, 3)
    rows = np.zeros((h, row_size), dtype=np.uint8)  # zero tail = row padding
    rows[:, : 3 * w] = rgb[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    return hdr + rows.tobytes()


def decode_bmp(blob: bytes) -> tuple[int, int, bytes]:
    """Parse a 24-bit uncompressed BMP → (w, h, RGB row-major top-down).

    A real parser, not a round-trip shortcut: it honors the pixel-array
    offset from the file header, the (possibly negative = top-down) height,
    row padding, and rejects compressed or non-24-bit files."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP file")
    (off,) = struct.unpack_from("<I", blob, 10)
    dib_size, w, h_raw, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if dib_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (dib={dib_size} bpp={bpp} comp={compression})")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    row_size = (3 * w + 3) // 4 * 4
    rows = np.frombuffer(blob, dtype=np.uint8, count=row_size * h, offset=off)
    bgr = rows.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]  # file rows are bottom-up; emit top-down
    return w, h, bgr[:, :, ::-1].tobytes()  # BGR on disk → RGB out


def _bmp_encode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        blobs = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            w, h = _bmp_dims(int(doc_id))
            pix = _bmp_pixels_from_text(text.encode("utf-8"), w, h)
            blobs.append(encode_bmp(w, h, pix))
        yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(), "blob": blobs})


def _bmp_resize_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real decode + nearest-neighbor thumbnail, all-integer geometry
    (src = (dst · src_dim) // dst_dim) so the oracle can replicate it.

    The source grid rows/cols are gathered with one fancy-index per image
    and summed in int64 — the same integers the per-pixel loop added."""
    for pdf in it:
        ids, ows, ohs, cks = [], [], [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            w, h, pix = decode_bmp(bytes(blob))
            mx = max(w, h)
            out_w = max(1, (w * BMP_THUMB) // mx)
            out_h = max(1, (h * BMP_THUMB) // mx)
            rgb = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)
            sy = np.arange(out_h, dtype=np.int64) * h // out_h
            sx = np.arange(out_w, dtype=np.int64) * w // out_w
            checksum = int(rgb[np.ix_(sy, sx)].sum(dtype=np.int64))
            ids.append(doc_id)
            ows.append(out_w)
            ohs.append(out_h)
            cks.append(checksum % 1_000_000)
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "out_width": ows,
                "out_height": ohs,
                "content_checksum": cks,
            }
        )


def _bmp_pipeline_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """encode → decode → thumbnail in ONE Python stage. The two kernels
    are composed unchanged (each is unit-tested on its own); fusing them
    stops the encoded BMP bytes from round-tripping Python → JVM → Python
    between two adjacent MapInPandas nodes (guide §4: the boundary costs,
    and no JVM work happened between the stages)."""
    for pdf in it:
        for enc in _bmp_encode_batch(iter([pdf])):
            yield from _bmp_resize_batch(iter([enc]))


@register(
    "m02_image_resize",
    oracle=f"""
    WITH imgs AS (
      SELECT doc_id, text,
             doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h,
             octet_length(encode(text)) AS n
      FROM documents
      WHERE doc_id % 3 = 0 AND length(text) > 0 AND strlen(text) = length(text)
    ),
    dims AS (
      SELECT *, greatest(w, h) AS mx,
             greatest(1, (w * {BMP_THUMB}) // greatest(w, h)) AS out_w,
             greatest(1, (h * {BMP_THUMB}) // greatest(w, h)) AS out_h
      FROM imgs
    ),
    px AS (
      SELECT doc_id, out_w, out_h,
             ascii(substr(text, ((((y * h) // out_h) * w + ((x * w) // out_w)) * 3 + c) % n + 1, 1)) AS byte
      FROM dims,
           unnest(range(0, out_w)) AS ux(x),
           unnest(range(0, out_h)) AS uy(y),
           unnest(range(0, 3)) AS uc(c)
    )
    SELECT doc_id, CAST(out_w AS BIGINT) AS out_width,
           CAST(out_h AS BIGINT) AS out_height,
           CAST(SUM(byte) % 1000000 AS BIGINT) AS content_checksum
    FROM px GROUP BY doc_id, out_w, out_h
    ORDER BY doc_id
    """,
    category="multimodal",
    doc=(
        "Image resize pipeline over REAL 24-bit BMPs: deterministic pixels "
        "(text bytes) → struct-packed BMP encode (bottom-up padded BGR "
        "rows) → genuine parse (header offsets, padding, row order; "
        "validated against an independent reader in pytest) → all-integer "
        "nearest-neighbor thumbnail → pixel checksum. Hash-checked: the "
        "oracle recomputes the checksum straight from the text bytes, so "
        "any encoder/decoder disagreement breaks parity. ASCII-only docs "
        "(bytes == chars) so DuckDB's ascii(substr(...)) sees the same "
        "bytes."
    ),
)
def m02_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_shipped(spark)
    docs = load_table(spark, "documents", sf_dir).filter(
        (F.col("doc_id") % 3 == 0)
        & (F.length("text") > 0)
        & (F.octet_length("text") == F.length("text"))
    )
    schema = "doc_id long, out_width long, out_height long, content_checksum long"
    return (
        docs.select("doc_id", "text")
        .mapInPandas(_bmp_pipeline_batch, schema)
        .orderBy("doc_id")
    )


def _frame_sample_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Video frame sampling stub: emits frame byte-offsets, one row per frame
    (explode-shaped output shows mapInPandas can change cardinality)."""
    fps, n_frames = 4, 3
    for pdf in it:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            size = len(bytes(blob)) - 12
            for f in range(n_frames):
                rows.append(
                    {
                        "doc_id": doc_id,
                        "frame_idx": f,
                        "ts_sec": f / fps,
                        "byte_offset": 12 + (size * f) // n_frames,
                    }
                )
        yield pd.DataFrame(rows)


@register(
    "m03_video_frame_sample",
    oracle="""
    WITH vids AS (
      SELECT doc_id, octet_length(encode(text)) AS size FROM documents WHERE doc_id % 3 = 2
    ),
    frames(frame_idx) AS (VALUES (0), (1), (2))
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_idx AS DOUBLE) / 4 AS ts_sec,
           CAST(12 + (size * frame_idx) // 3 AS BIGINT) AS byte_offset
    FROM vids CROSS JOIN frames
    ORDER BY doc_id, frame_idx
    """,
    category="multimodal",
    doc=(
        "Video frame sampling at the container level (byte-offset grid — "
        "no codec needed): 1-row-in → N-frames-out through mapInPandas; "
        "offsets are deterministic so the oracle can recompute them "
        "relationally."
    ),
)
def m03_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_shipped(spark)
    docs = load_table(spark, "documents", sf_dir)
    vids = synthesize_blobs(docs).filter(F.col("media_type") == "video")
    schema = "doc_id long, frame_idx long, ts_sec double, byte_offset long"
    return vids.mapInPandas(_frame_sample_batch, schema).orderBy("doc_id", "frame_idx")


# --- m04: REAL RIFF/WAVE PCM16 encode → decode → features --------------------
# Sample i is (text_byte_i − 64) · 512 (int16 range), so DuckDB recomputes
# every feature from the text; sums of squares are exact integers, so no
# aggregation-order issue can split the engines.

AUDIO_SAMPLE_RATE = 8000


def _wav_samples_from_text(text_bytes: bytes) -> list[int]:
    arr = (np.frombuffer(text_bytes, dtype=np.uint8).astype(np.int64) - 64) * 512
    return arr.tolist()  # same ints as [(b - 64) * 512 for b in text_bytes]


def encode_wav(samples: list[int], rate: int = AUDIO_SAMPLE_RATE) -> bytes:
    """A genuine RIFF/WAVE file: PCM (format 1), mono, 16-bit little-endian
    — playable by any audio tool; validated against the stdlib ``wave``
    reader in pytest."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[int, list[int]]:
    """Chunk-walking RIFF parser → (sample_rate, int16 samples). Handles
    arbitrary chunk order/extra chunks, rejects non-PCM/non-16-bit/stereo."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt} ch={channels} bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, list(struct.unpack(f"<{len(data) // 2}h", data))


def _wav_encode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            samples = _wav_samples_from_text(text.encode("utf-8"))
            rows.append({"doc_id": doc_id, "blob": encode_wav(samples)})
        yield pd.DataFrame(rows)


def _audio_features_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real WAV decode then RMS / peak / zero-crossing-rate. The sum of
    squares is taken over exact int64 (then divided once), matching the
    oracle's integer SUM — no float accumulation order anywhere."""
    import numpy as np

    for pdf in it:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            rate, samples = decode_wav(bytes(blob))
            s = np.asarray(samples, dtype=np.int64)
            n = len(s)
            zc = int(np.count_nonzero((s[1:] < 0) != (s[:-1] < 0)))
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_samples": n,
                    "duration_sec": round(1e-9 + n / rate, 4),
                    "rms": round(1e-9 + float(np.sqrt(float(int((s * s).sum())) / n)), 4),
                    "peak": int(np.abs(s).max()),
                    "zero_cross_rate": round(1e-9 + zc / n, 4),
                }
            )
        yield pd.DataFrame(rows)


def _wav_pipeline_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """encode → decode → features in ONE Python stage (same fusion as
    m02's `_bmp_pipeline_batch`: the unit-tested kernels compose unchanged,
    and the WAV bytes stop round-tripping Python → JVM → Python)."""
    for pdf in it:
        for enc in _wav_encode_batch(iter([pdf])):
            yield from _audio_features_batch(iter([enc]))


@register(
    "m04_audio_features",
    oracle=f"""
    WITH audio AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents
      WHERE doc_id % 3 = 1 AND length(text) > 0 AND strlen(text) = length(text)
    ),
    samples AS (
      SELECT doc_id, n, i, (ascii(substr(text, i + 1, 1)) - 64) * 512 AS s
      FROM audio, unnest(range(0, n)) AS u(i)
    ),
    zc AS (
      SELECT a.doc_id, COUNT(*) FILTER (WHERE (a.s < 0) <> (b.s < 0)) AS zc
      FROM samples a JOIN samples b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      GROUP BY a.doc_id
    )
    SELECT s.doc_id,
           CAST(s.n AS BIGINT) AS n_samples,
           round(1e-9 + CAST(s.n AS DOUBLE) / {AUDIO_SAMPLE_RATE}, 4) AS duration_sec,
           round(1e-9 + sqrt(CAST(SUM(s.s * s.s) AS DOUBLE) / s.n), 4) AS rms,
           CAST(MAX(abs(s.s)) AS BIGINT) AS peak,
           round(1e-9 + CAST(COALESCE(ANY_VALUE(zc.zc), 0) AS DOUBLE) / s.n, 4) AS zero_cross_rate
    FROM samples s LEFT JOIN zc ON zc.doc_id = s.doc_id
    GROUP BY s.doc_id, s.n
    ORDER BY s.doc_id
    """,
    category="multimodal",
    doc=(
        "Audio feature extraction over REAL RIFF/WAVE PCM16 files: "
        "deterministic samples (text bytes) → struct-packed WAV encode → "
        "genuine chunk-walking parse (validated against the stdlib wave "
        "reader in pytest) → RMS / peak / duration / zero-crossing rate. "
        "Hash-checked: the oracle recomputes every feature from the text; "
        "sums of squares are exact integers so aggregation order cannot "
        "split the engines. ASCII-only docs (bytes == chars)."
    ),
)
def m04_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_shipped(spark)
    docs = load_table(spark, "documents", sf_dir).filter(
        (F.col("doc_id") % 3 == 1)
        & (F.length("text") > 0)
        & (F.octet_length("text") == F.length("text"))
    )
    schema = (
        "doc_id long, n_samples long, duration_sec double, rms double, "
        "peak long, zero_cross_rate double"
    )
    return (
        docs.select("doc_id", "text")
        .mapInPandas(_wav_pipeline_batch, schema)
        .orderBy("doc_id")
    )


@register(
    "m05_binaryfile_ingest",
    oracle="""
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, md5(text) AS digest
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
    category="multimodal",
    doc=(
        "Distributed blob ingest via Spark's binaryFile source: one file "
        "per document is laid down, read back as (path, length, content "
        "binary) rows with executor-parallel IO, and verified byte-exact "
        "against the source table (byte length + md5 digest both computed "
        "from the ingested bytes). This is the entry path for a real "
        "image/audio corpus at 100 TB — a partitioned directory tree of "
        "blobs scanned by pathGlobFilter, no driver involvement per file."
    ),
)
def m05_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    # Lay down the blob directory (ingest-side setup, not the measured op:
    # at scale the blobs already exist on object storage). Bounded: 200
    # files regardless of SF.
    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
        .collect()
    )
    path = tempfile.mkdtemp(prefix="hds_blobs_")
    for r in docs:
        with open(os.path.join(path, f"doc_{int(r['doc_id']):06d}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    return (
        back.select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.length(F.col("content")).cast("bigint").alias("n_bytes"),
            F.md5(F.col("content")).alias("digest"),
        )
        .orderBy("doc_id")
    )


CAS_CHUNK_BYTES = 64


@register(
    "m06_blob_chunk_store",
    oracle=f"""
    WITH payload AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
             text
      FROM documents
      WHERE length(text) > 0 AND strlen(text) = length(text)
    ),
    chunks AS (
      SELECT media_type,
             md5(substr(text, i + 1, {CAS_CHUNK_BYTES})) AS h
      FROM payload, unnest(range(0, length(text), {CAS_CHUNK_BYTES})) AS r(i)
    )
    SELECT media_type,
           CAST(count(*) AS BIGINT) AS total_chunks,
           CAST(count(DISTINCT h) AS BIGINT) AS distinct_chunks,
           round(1e-9 + 1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 4) AS dedup_savings
    FROM chunks GROUP BY media_type ORDER BY media_type
    """,
    category="multimodal",
    doc=(
        f"Content-addressable blob store audit: each blob's payload is cut "
        f"into {CAS_CHUNK_BYTES}-byte chunks, fingerprinted with md5 OVER "
        "THE BINARY (Spark md5 accepts binary directly), and the per-media "
        "dedup savings of a chunk store is reported — the storage-layer "
        "counterpart of d09's corpus-text chunk dedup. The Spark side does "
        "real byte-level work (synthesized container blob → header strip "
        "via binary substring → binary chunking); DuckDB has no blob "
        "substring/md5, so BOTH engines restrict to documents whose text "
        "is non-empty pure ASCII (strlen == length, i.e. bytes == chars) "
        "— the guard that makes string chunking provably byte-identical "
        "rather than an unchecked assumption, and keeps empty payloads "
        "out of Spark's sequence() (whose [0, −1] bounds would error). "
        "One scan, one shuffle on (media, fingerprint) with "
        "map-side combine."
    ),
)
def m06_blob_chunk_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same admission guard as the oracle: non-empty, pure-ASCII payloads
    # (octet_length == char_length). Keeps byte-chunking provably equal to
    # the oracle's char-chunking and empty payloads out of sequence().
    docs = load_table(spark, "documents", sf_dir).filter(
        (F.length("text") > 0) & (F.octet_length("text") == F.length("text"))
    )
    blobs = synthesize_blobs(docs)
    payload = F.expr("substring(blob, 13, length(blob) - 12)")  # strip 12-byte header
    # substring with a column start position needs expr-form; build via SQL
    chunked = (
        blobs.select("media_type", payload.alias("payload"))
        .select(
            "media_type",
            F.explode(
                F.expr(
                    "transform(sequence(0, length(payload) - 1, "
                    f"{CAS_CHUNK_BYTES}), i -> md5(substring(payload, i + 1, "
                    f"{CAS_CHUNK_BYTES})))"
                )
            ).alias("h"),
        )
    )
    return (
        chunked.groupBy("media_type")
        .agg(
            F.count("*").cast("bigint").alias("total_chunks"),
            F.count_distinct("h").cast("bigint").alias("distinct_chunks"),
            F.round(
                F.lit(1e-9)
                + 1.0 - F.count_distinct("h").cast("double") / F.count("*"),
                4,
            ).alias("dedup_savings"),
        )
        .transform(present_sorted, "media_type")
    )


@register(
    "m07_header_parse_codegen",
    oracle="""
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(doc_id % 640 + 16) AS BIGINT) AS total_width,
           CAST(sum(doc_id % 480 + 16) AS BIGINT) AS total_height,
           CAST(sum(strlen(text)) AS BIGINT) AS total_payload_bytes,
           CAST(count(*) AS BIGINT) AS n_valid_magic
    FROM documents GROUP BY media_type ORDER BY media_type
    """,
    category="multimodal",
    doc=(
        "Binary header parsing entirely in whole-stage codegen — the "
        "Python-free twin of m01's mapInPandas parser: magic check via a "
        "binary-literal substring compare, big-endian uint32 width/height "
        "decoded with hex/conv byte arithmetic, payload size from "
        "length(blob)-12, aggregated per media type. At 100 TB this is the "
        "header-level corpus profile (or filter) you run BEFORE paying for "
        "Python decode workers; the oracle recomputes every field from the "
        "deterministic blob-synthesis rule. Texts are ASCII so "
        "strlen(text) == payload byte length."
    ),
)
def m07_header_parse_codegen(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    blobs = synthesize_blobs(docs)
    width = F.conv(F.hex(F.substring(F.col("blob"), 5, 4)), 16, 10).cast("bigint")
    height = F.conv(F.hex(F.substring(F.col("blob"), 9, 4)), 16, 10).cast("bigint")
    valid = F.substring(F.col("blob"), 1, 4) == F.lit(MAGIC)
    return (
        blobs.groupBy("media_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(width).alias("total_width"),
            F.sum(height).alias("total_height"),
            F.sum(F.length("blob") - 12).cast("bigint").alias("total_payload_bytes"),
            F.sum(valid.cast("int")).cast("bigint").alias("n_valid_magic"),
        )
        .transform(present_sorted, "media_type")
    )


@register(
    "m08_duplicate_frames",
    oracle="""
    WITH vids AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
    frames AS (
      SELECT doc_id, i AS frame_no, md5(substr(text, (i-1)*16 + 1, 16)) AS fhash
      FROM vids, unnest(range(1, CAST(ceil(length(text)/16.0) AS BIGINT) + 1)) AS r(i)
      WHERE length(substr(text, (i-1)*16 + 1, 16)) = 16),
    dups AS (
      SELECT fhash, count(*) AS n_frames, count(DISTINCT doc_id) AS n_videos
      FROM frames GROUP BY fhash
      HAVING count(DISTINCT doc_id) > 1)
    SELECT fhash, CAST(n_frames AS BIGINT) AS n_frames,
           CAST(n_videos AS BIGINT) AS n_videos
    FROM dups ORDER BY fhash
    """,
    category="multimodal",
    doc=(
        "Cross-video duplicate-frame detection: each 'video' document's "
        "payload is cut into fixed 16-byte frames (the m03 frame-sampling "
        "grid), frames are content-hashed, and hashes appearing in more "
        "than one video are reported — the shot/segment-level dedup a "
        "video corpus needs where document-level hashing sees nothing. "
        "Pure codegen (substring + md5 + grouped count, no Python); the "
        "frame hash is the shuffle key so no all-pairs comparison forms, "
        "the same bucket-join scale shape as d09's text chunks."
    ),
)
def m08_duplicate_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") % 3 == 2)
    n_frames = F.ceil(F.length("text") / 16.0).cast("int")
    frames = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), n_frames)).alias("i"),
        F.col("text"),
    ).select(
        "doc_id",
        F.md5(F.expr("substr(text, (i-1)*16 + 1, 16)")).alias("fhash"),
        F.length(F.expr("substr(text, (i-1)*16 + 1, 16)")).alias("flen"),
    ).filter(F.col("flen") == 16)
    return (
        frames.groupBy("fhash")
        .agg(
            F.count("*").alias("n_frames"),
            F.count_distinct("doc_id").alias("n_videos"),
        )
        .filter(F.col("n_videos") > 1)
        .select(
            "fhash",
            F.col("n_frames").cast("bigint").alias("n_frames"),
            F.col("n_videos").cast("bigint").alias("n_videos"),
        )
        .transform(present_sorted, "fhash")
    )
