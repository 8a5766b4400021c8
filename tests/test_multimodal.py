"""Exactness checks for the REAL multimodal codecs: the struct-packed
BMP/WAV writers and the from-scratch parsers must agree with independent
readers (stdlib ``wave`` for WAV; a separately-written minimal reader and
ground-truth pixel content for BMP), and the Spark pipelines must
reproduce a pure-Python reference computation byte-for-byte."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from highs_duckdb_spark.operators.multimodal import (
    AUDIO_SAMPLE_RATE,
    BMP_THUMB,
    _bmp_dims,
    _bmp_pixels_from_text,
    _wav_samples_from_text,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    m02_image_resize,
    m04_audio_features,
)
from highs_duckdb_spark.session import load_table

SF = "/root/testdata/sf0.001"


# --- WAV codec ---------------------------------------------------------------


def test_wav_roundtrip_and_stdlib_parity():
    """encode_wav output is a real WAV: the stdlib wave reader (independent
    implementation) recovers the same rate and samples as decode_wav."""
    samples = [(b - 64) * 512 for b in b"hello WAV world 0123"]
    blob = encode_wav(samples)
    rate, got = decode_wav(blob)
    assert rate == AUDIO_SAMPLE_RATE and got == samples
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getframerate() == AUDIO_SAMPLE_RATE
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        raw = w.readframes(w.getnframes())
    assert list(struct.unpack(f"<{len(raw) // 2}h", raw)) == samples


def test_wav_decoder_walks_extra_chunks():
    """A LIST chunk inserted before fmt/data (as real encoders emit) must
    not confuse the chunk walker; odd-sized chunks are 2-byte aligned."""
    samples = [100, -100, 0, 32000, -32000]
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, AUDIO_SAMPLE_RATE, AUDIO_SAMPLE_RATE * 2, 2, 16)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    body = b"WAVE" + extra + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, got = decode_wav(blob)
    assert rate == AUDIO_SAMPLE_RATE and got == samples


def test_wav_decoder_rejects_non_pcm():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 0)
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


# --- BMP codec ---------------------------------------------------------------


def _independent_bmp_read(blob: bytes) -> tuple[int, int, bytes]:
    """A second, separately-written minimal BMP reader (positive-height
    bottom-up 24-bit only) used to cross-check decode_bmp."""
    assert blob[:2] == b"BM"
    off = int.from_bytes(blob[10:14], "little")
    w = int.from_bytes(blob[18:22], "little", signed=True)
    h = int.from_bytes(blob[22:26], "little", signed=True)
    assert h > 0
    stride = (3 * w + 3) & ~3
    out = bytearray()
    for y in range(h):  # emit top-down
        row = blob[off + (h - 1 - y) * stride :][: 3 * w]
        for x in range(w):
            b, g, r = row[3 * x : 3 * x + 3]
            out += bytes((r, g, b))
    return w, h, bytes(out)


def test_bmp_roundtrip_and_independent_reader():
    pix = bytes(range(256)) * 3  # 16×16 RGB
    blob = encode_bmp(16, 16, pix[: 16 * 16 * 3])
    w, h, got = decode_bmp(blob)
    assert (w, h) == (16, 16) and got == pix[: 16 * 16 * 3]
    assert _independent_bmp_read(blob) == (16, 16, pix[: 16 * 16 * 3])


def test_bmp_padding_and_odd_width():
    """w=5 → 15-byte rows padded to 16; decode must skip the pad bytes."""
    pix = bytes((i * 7) % 256 for i in range(5 * 3 * 3))
    blob = encode_bmp(5, 3, pix)
    assert decode_bmp(blob) == (5, 3, pix)
    assert _independent_bmp_read(blob) == (5, 3, pix)


def test_bmp_decoder_handles_topdown_files():
    """Negative-height BMPs store rows top-down — a shape our encoder never
    emits, proving the parser is general, not a round-trip shortcut."""
    w, h = 3, 2
    pix = bytes(range(w * h * 3))  # desired RGB top-down
    stride = (3 * w + 3) & ~3
    off = 54
    hdr = (
        b"BM"
        + struct.pack("<IHHI", off + stride * h, 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, stride * h, 0, 0, 0, 0)
    )
    body = bytearray()
    for y in range(h):  # file rows ARE top-down for negative height
        row = bytearray()
        for x in range(w):
            r, g, b = pix[(y * w + x) * 3 : (y * w + x) * 3 + 3]
            row += bytes((b, g, r))
        row += b"\x00" * (stride - 3 * w)
        body += row
    assert decode_bmp(bytes(hdr) + bytes(body)) == (w, h, pix)


def test_bmp_decoder_rejects_compressed():
    blob = bytearray(encode_bmp(4, 4, bytes(48)))
    struct.pack_into("<I", blob, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(blob))


def test_vectorized_pixels_and_checksum_match_per_byte_loop():
    """The NumPy kernels (round-12 vectorization) must reproduce the
    original per-byte loops exactly — including cyclic pixel repetition
    with an awkward text length and thumbnail UPSAMPLING (w or h < 16 →
    repeated gather indices in the fancy-index path)."""
    import pandas as pd

    from highs_duckdb_spark.operators.multimodal import _bmp_resize_batch

    text = bytes(range(7, 7 + 41))  # n=41: not a divisor of any w*h*3
    for w, h in [(9, 12), (31, 8), (8, 23), (16, 16)]:
        pix = _bmp_pixels_from_text(text, w, h)
        assert pix == bytes(text[i % len(text)] for i in range(w * h * 3))
        # reference checksum: the original per-pixel loop
        mx = max(w, h)
        out_w, out_h = max(1, w * BMP_THUMB // mx), max(1, h * BMP_THUMB // mx)
        want = 0
        for y in range(out_h):
            sy = (y * h) // out_h
            for x in range(out_w):
                sx = (x * w) // out_w
                p = (sy * w + sx) * 3
                want += pix[p] + pix[p + 1] + pix[p + 2]
        blob = encode_bmp(w, h, pix)
        (out,) = _bmp_resize_batch(
            iter([pd.DataFrame({"doc_id": [1], "blob": [blob]})])
        )
        assert out.iloc[0]["out_width"] == out_w
        assert out.iloc[0]["out_height"] == out_h
        assert out.iloc[0]["content_checksum"] == want % 1_000_000, (w, h)


# --- Spark pipelines vs pure-Python references -------------------------------


def test_m02_matches_python_reference(spark):
    out = {r["doc_id"]: r.asDict() for r in m02_image_resize(spark, SF).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, "documents", SF)
        .filter("doc_id % 3 = 0 AND length(text) > 0")
        .limit(20)
        .collect()
    }
    assert docs, "no image-typed docs in fixture"
    for doc_id, text in docs.items():
        tb = text.encode("utf-8")
        if len(tb) != len(text):
            continue  # non-ASCII docs are excluded by the operator's guard
        w, h = _bmp_dims(doc_id)
        pix = _bmp_pixels_from_text(tb, w, h)
        mx = max(w, h)
        out_w, out_h = max(1, w * BMP_THUMB // mx), max(1, h * BMP_THUMB // mx)
        checksum = sum(
            pix[((y * h // out_h) * w + (x * w // out_w)) * 3 + c]
            for y in range(out_h)
            for x in range(out_w)
            for c in range(3)
        )
        assert out[doc_id] == {
            "doc_id": doc_id,
            "out_width": out_w,
            "out_height": out_h,
            "content_checksum": checksum % 1_000_000,
        }, doc_id


def test_m04_matches_python_reference(spark):
    out = {r["doc_id"]: r.asDict() for r in m04_audio_features(spark, SF).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, "documents", SF)
        .filter("doc_id % 3 = 1 AND length(text) > 0")
        .limit(20)
        .collect()
    }
    assert docs, "no audio-typed docs in fixture"
    for doc_id, text in docs.items():
        tb = text.encode("utf-8")
        if len(tb) != len(text):
            continue
        samples = np.asarray(_wav_samples_from_text(tb), dtype=np.int64)
        n = len(samples)
        zc = int(np.count_nonzero((samples[1:] < 0) != (samples[:-1] < 0)))
        assert out[doc_id] == {
            "doc_id": doc_id,
            "n_samples": n,
            "duration_sec": round(1e-9 + n / AUDIO_SAMPLE_RATE, 4),
            "rms": round(1e-9 + float(np.sqrt(float(int((samples * samples).sum())) / n)), 4),
            "peak": int(np.abs(samples).max()),
            "zero_cross_rate": round(1e-9 + zc / n, 4),
        }, doc_id
