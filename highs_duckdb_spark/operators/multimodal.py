"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the *decode* steps are stubbed
behind ``HDS_FAKE_DECODE`` (a deterministic fake) / ``NotImplementedError``
— but everything Spark-side is real and tested: binary column handling,
UDF signatures and batch shapes, ``mapInPandas`` iterator plumbing, and the
partitioning story (batch size capped so a partition of blobs never
materializes at once).

Synthetic blobs: since the testdata has no binary table, each document's
text is packed into a fake container format::

    bytes 0-3   magic  b"HDSB"
    bytes 4-7   width  (big-endian uint32, deterministic from doc_id)
    bytes 8-11  height (big-endian uint32)
    bytes 12-   payload (utf-8 text)

so metadata parsing is real byte-level work with a checkable answer.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from highs_duckdb_spark.functions.presentation import present_sorted
from highs_duckdb_spark.operators.registry import register
from highs_duckdb_spark.session import ensure_shipped, load_table

MAGIC = b"HDSB"

#: flip to raise NotImplementedError from the decode stubs (the behavior a
#: real deployment would see without codecs installed)
FAKE_DECODE = os.environ.get("HDS_FAKE_DECODE", "1") == "1"


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


def _decode_image_stub(blob: bytes) -> dict:
    """Decode stub: a real build would call PIL/libjpeg here."""
    if not FAKE_DECODE:
        raise NotImplementedError("image codecs not available in this container")
    w, h = struct.unpack(">II", blob[4:12])
    # deterministic fake "pixels": payload checksum stands in for content
    checksum = sum(blob[12:]) % 1_000_000
    return {"width": w, "height": h, "checksum": checksum}


def _resize_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    target = 64
    for pdf in it:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            meta = _decode_image_stub(bytes(blob))
            scale = target / max(meta["width"], meta["height"])
            rows.append(
                {
                    "doc_id": doc_id,
                    "out_width": max(1, int(meta["width"] * scale)),
                    "out_height": max(1, int(meta["height"] * scale)),
                    "content_checksum": meta["checksum"],
                }
            )
        yield pd.DataFrame(rows)


@register(
    "m02_image_resize",
    oracle=None,  # decode is stubbed; plumbing checked rows-only + in pytest
    category="multimodal",
    doc=(
        "Image resize pipeline: decode (STUBBED — deterministic fake, flag "
        "HDS_FAKE_DECODE) → aspect-preserving thumbnail dims → checksum; "
        "real Arrow batch plumbing via mapInPandas."
    ),
)
def m02_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_shipped(spark)
    docs = load_table(spark, "documents", sf_dir)
    images = synthesize_blobs(docs).filter(F.col("media_type") == "image")
    schema = "doc_id long, out_width long, out_height long, content_checksum long"
    return images.mapInPandas(_resize_batch, schema).orderBy("doc_id")


def _frame_sample_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Video frame sampling stub: emits frame byte-offsets, one row per frame
    (explode-shaped output shows mapInPandas can change cardinality)."""
    fps, n_frames = 4, 3
    for pdf in it:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            if not FAKE_DECODE:
                raise NotImplementedError("video codecs not available in this container")
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
        "Video frame sampling (decode STUBBED): 1-row-in → N-frames-out "
        "through mapInPandas; offsets are deterministic so the oracle can "
        "recompute them relationally."
    ),
)
def m03_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_shipped(spark)
    docs = load_table(spark, "documents", sf_dir)
    vids = synthesize_blobs(docs).filter(F.col("media_type") == "video")
    schema = "doc_id long, frame_idx long, ts_sec double, byte_offset long"
    return vids.mapInPandas(_frame_sample_batch, schema).orderBy("doc_id", "frame_idx")


AUDIO_SAMPLE_RATE = 8000  # fake PCM rate for the stubbed decode


def _audio_features_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Audio feature extraction: fake-decode payload bytes as signed int8
    PCM samples, then numpy-vectorized RMS / peak / zero-crossing-rate —
    the real feature math over the stubbed decode."""
    import numpy as np

    for pdf in it:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            if not FAKE_DECODE:
                raise NotImplementedError("audio codecs not available in this container")
            samples = np.frombuffer(bytes(blob)[12:], dtype=np.int8).astype(np.float64)
            n = len(samples)
            if n == 0:
                rows.append({"doc_id": doc_id, "n_samples": 0, "duration_sec": 0.0,
                             "rms": 0.0, "peak": 0, "zero_cross_rate": 0.0})
                continue
            zc = int(np.count_nonzero(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_samples": n,
                    "duration_sec": round(1e-9 + n / AUDIO_SAMPLE_RATE, 4),
                    "rms": round(1e-9 + float(np.sqrt((samples * samples).mean())), 4),
                    "peak": int(np.abs(samples).max()),
                    "zero_cross_rate": round(1e-9 + zc / n, 4),
                }
            )
        yield pd.DataFrame(rows)


@register(
    "m04_audio_features",
    oracle=None,  # byte-level PCM math is not SQL-expressible; exactness vs a pure-Python reference in pytest
    category="multimodal",
    doc=(
        "Audio feature extraction (decode STUBBED as int8 PCM): RMS, peak, "
        "duration at the fake sample rate, zero-crossing rate — numpy-"
        "vectorized per Arrow batch via mapInPandas; completes the "
        "multimodal set (metadata/resize/frame-sample/feature-extract)."
    ),
)
def m04_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_shipped(spark)
    docs = load_table(spark, "documents", sf_dir)
    audio = synthesize_blobs(docs).filter(F.col("media_type") == "audio")
    schema = (
        "doc_id long, n_samples long, duration_sec double, rms double, "
        "peak long, zero_cross_rate double"
    )
    return audio.mapInPandas(_audio_features_batch, schema).orderBy("doc_id")


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
