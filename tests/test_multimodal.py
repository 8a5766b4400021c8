"""Exactness checks for the multimodal stubs: the Spark pipelines must
reproduce a pure-Python reference computation byte-for-byte."""

from __future__ import annotations

import numpy as np

from highs_duckdb_spark.operators.multimodal import (
    AUDIO_SAMPLE_RATE,
    m04_audio_features,
)
from highs_duckdb_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _reference_features(doc_id: int, text: str) -> dict:
    samples = np.frombuffer(text.encode("utf-8"), dtype=np.int8).astype(np.float64)
    n = len(samples)
    zc = int(np.count_nonzero(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
    return {
        "doc_id": doc_id,
        "n_samples": n,
        "duration_sec": round(1e-9 + n / AUDIO_SAMPLE_RATE, 4),
        "rms": round(1e-9 + float(np.sqrt((samples * samples).mean())), 4),
        "peak": int(np.abs(samples).max()),
        "zero_cross_rate": round(1e-9 + zc / n, 4),
    }


def test_m04_matches_python_reference(spark):
    out = {r["doc_id"]: r.asDict() for r in m04_audio_features(spark, SF).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, "documents", SF).filter("doc_id % 3 = 1").limit(20).collect()
    }
    assert docs, "no audio-typed docs in fixture"
    for doc_id, text in docs.items():
        assert out[doc_id] == _reference_features(doc_id, text), doc_id
