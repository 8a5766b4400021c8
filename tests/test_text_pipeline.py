"""Targeted kernel tests for the round-2 text/pipeline additions.

The oracle-parity suite already hash-checks t11/t12/p10/q123/q124 against
DuckDB; these tests pin behaviors the synthetic corpus cannot exercise
(real PII strings) and replicate the A-ES sampler brute-force in Python.
"""

from __future__ import annotations

import hashlib
import math

import pytest

import pyspark.sql.functions as F

from highs_duckdb_spark.operators.text import PAT_EMAIL, PAT_IP, PAT_PHONE
from highs_duckdb_spark.operators.pipeline_ops import WEIGHTED_SAMPLE_K
from highs_duckdb_spark.operators.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _redact(spark, text: str) -> tuple[str, int, int, int]:
    df = spark.createDataFrame([(text,)], "s string").select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("s"), PAT_EMAIL, "<EMAIL>"),
                PAT_PHONE,
                "<PHONE>",
            ),
            PAT_IP,
            "<IP>",
        ).alias("red"),
        F.regexp_count("s", F.lit(PAT_EMAIL)).alias("e"),
        F.regexp_count("s", F.lit(PAT_PHONE)).alias("p"),
        F.regexp_count("s", F.lit(PAT_IP)).alias("i"),
    )
    r = df.collect()[0]
    return r.red, r.e, r.p, r.i


def test_pii_kernel_real_strings(spark):
    red, e, p, i = _redact(
        spark,
        "mail jane.doe+spam@sub.example.org or call 212-555-0188, "
        "server at 192.168.255.1 works",
    )
    assert red == "mail <EMAIL> or call <PHONE>, server at <IP> works"
    assert (e, p, i) == (1, 1, 1)


def test_pii_kernel_negatives(spark):
    # version strings and decimals must not be flagged as IPs/phones
    red, e, p, i = _redact(spark, "release v1.2 costs 10.99 at a rate of 3-4")
    assert (e, p, i) == (0, 0, 0)
    assert red == "release v1.2 costs 10.99 at a rate of 3-4"


def test_pii_multiple_matches(spark):
    red, e, p, i = _redact(spark, "a@b.io c@d.io 10.0.0.1 10.0.0.2")
    assert (e, i) == (2, 2)
    assert red == "<EMAIL> <EMAIL> <IP> <IP>"


def test_weighted_sample_matches_bruteforce(spark):
    """p10 must pick exactly the docs the A-ES formula picks in pure Python."""
    rows = (
        QUERIES["p10_weighted_sample"].builder(spark, SF_DIR).collect()
    )
    docs = [
        (r.doc_id, r.lang, r.n_chars)
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
        .collect()
    ]
    expect: dict[str, list[int]] = {}
    by_lang: dict[str, list[tuple[float, int, int]]] = {}
    for doc_id, lang, n_chars in docs:
        u6 = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:6], 16)
        u = (u6 + 1) / 16777217.0
        k = math.log(u) / max(n_chars, 1)
        by_lang.setdefault(lang, []).append((k, doc_id, n_chars))
    for lang, lst in by_lang.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        expect[lang] = [doc_id for _, doc_id, _ in lst[:WEIGHTED_SAMPLE_K]]
    got: dict[str, list[int]] = {}
    for r in rows:
        got.setdefault(r.lang, []).append(r.doc_id)  # rows arrive lang,rk sorted
    assert got == expect


def test_weighted_sample_prefers_heavy_docs(spark):
    """Inclusion should skew toward longer docs: the sampled mean n_chars
    must exceed the corpus mean (weights are document lengths)."""
    sampled = QUERIES["p10_weighted_sample"].builder(spark, SF_DIR)
    s_mean = sampled.agg(F.avg("n_chars")).collect()[0][0]
    c_mean = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert s_mean > c_mean


def test_q127_observation_metrics_match_results(spark):
    """The observe() counters captured during the pass must equal what the
    aggregate itself reports (rows_in = Σn, price_sum = Σ totals)."""

    df = QUERIES["q127_observed_pipeline"].builder(spark, SF_DIR)
    rows = df.collect()  # triggers the single pass; metrics become available
    m = df._hds_observation.get
    assert m["rows_in"] == sum(r.n for r in rows)
    assert float(m["price_sum"]) == pytest.approx(
        sum(r.total for r in rows), abs=1e-4
    )
