"""Round-3 additions: deterministic cross-engine estimators.

q61/q90/q91 were re-based on engine-neutral md5 hashing (the d03 pattern)
so DuckDB replicates them bit-for-bit — these tests pin the *statistical*
contract the hash-parity check can't see: the estimators must actually
estimate (close to exact truth), and the native-sketch twins
(q172/q173/q174) must stay within their documented error bounds.
"""

from __future__ import annotations

import os

import pytest

from highs_duckdb_spark.operators import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _rows(spark, name):
    return {
        r[0]: list(r)[1:] for r in QUERIES[name].builder(spark, SF_DIR).collect()
    }


def test_hll_estimate_tracks_exact(spark):
    """q61's md5-HLL (m=64 -> ~13% std error) vs q60's exact count."""
    exact = _rows(spark, "q60_approx_distinct")
    est = _rows(spark, "q61_approx_distinct_hll")
    assert set(exact) == set(est)
    for flag, (n_exact,) in exact.items():
        (n_est,) = est[flag]
        assert n_est > 0
        rel = abs(n_est - n_exact) / max(n_exact, 1)
        assert rel < 0.35, f"{flag}: HLL {n_est} vs exact {n_exact} ({rel:.1%})"


def test_native_hll_tracks_exact(spark):
    exact = _rows(spark, "q60_approx_distinct")
    est = _rows(spark, "q172_native_hll_sketch")
    for flag, (n_exact,) in exact.items():
        (n_est,) = est[flag]
        assert abs(n_est - n_exact) / max(n_exact, 1) < 0.1  # HLL++ rsd ~2-5%


def test_hash_sampled_percentile_tracks_exact(spark):
    """q90's deterministic 10% hash-sample percentiles vs q62's exact ones."""
    exact = _rows(spark, "q62_percentiles")
    est = _rows(spark, "q90_approx_percentile")
    assert set(exact) == set(est)
    for prio, (p50, p90) in exact.items():
        e50, e90 = est[prio]
        # o_totalprice spans ~[850, 480k]; a 10% sample of a few hundred
        # rows per group keeps quantiles within a loose relative band
        assert abs(e50 - p50) / p50 < 0.35
        assert abs(e90 - p90) / p90 < 0.35


def test_hash_sample_rate_and_determinism(spark):
    """q91 keeps ~10% of lineitem, identically on every run."""
    import pyspark.sql.functions as F

    from highs_duckdb_spark.session import load_table

    total = load_table(spark, "lineitem", SF_DIR).count()
    first = _rows(spark, "q91_tablesample")
    again = _rows(spark, "q91_tablesample")
    assert first == again  # same membership on re-execution, no RNG
    sampled = sum(v[0] for v in first.values())
    assert 0.05 * total < sampled < 0.15 * total

    # RNG twin keeps the same rate (within Bernoulli noise), seeded-stable
    rng1 = _rows(spark, "q174_native_rng_tablesample")
    rng2 = _rows(spark, "q174_native_rng_tablesample")
    assert rng1 == rng2
    rng_n = sum(v[0] for v in rng1.values())
    assert 0.05 * total < rng_n < 0.15 * total


def test_countmin_overestimates_never_under(spark):
    """Count-Min's one-sided error guarantee: est >= exact for every token."""
    df = QUERIES["t25_countmin_heavy_hitters"].builder(spark, SF_DIR)
    for r in df.collect():
        assert r["est_count"] >= r["exact_count"], r


def test_bm25_ranks_match_naive(spark):
    """t24's distributed BM25 equals a driver-side reference computation."""
    import math
    import re

    from highs_duckdb_spark.session import load_table

    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text").collect()
    tokens = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip().lower(), flags=re.ASCII)
        for r in docs
    }
    n_docs = len(tokens)
    avgdl = sum(len(t) for t in tokens.values()) / n_docs
    terms = ["hash", "join", "vector", "spark"]
    df_t = {t: sum(1 for toks in tokens.values() if t in toks) for t in terms}
    scores = {}
    for doc_id, toks in tokens.items():
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log((n_docs - df_t[t] + 0.5) / (df_t[t] + 0.5) + 1)
            s += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(toks) / avgdl))
        if s > 0:
            scores[doc_id] = round(1e-9 + s, 4)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc_id"], r["bm25"])
        for r in QUERIES["t24_bm25_ranking"].builder(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_kmv_estimates_track_exact_set_sizes(spark):
    """q176's KMV union/intersection estimates vs exact distinct counts
    (k=128 -> ~9% rsd; assert a loose 35% band, exact when n < k)."""
    import pyspark.sql.functions as F

    from highs_duckdb_spark.session import load_table

    ev = load_table(spark, "events", SF_DIR)
    users = {
        r["event_type"]: set(x["user_id"] for x in rows)
        for r, rows in (
            (r, ev.filter(F.col("event_type") == r["event_type"])
                  .select("user_id").distinct().collect())
            for r in ev.select("event_type").distinct().collect()
        )
    }
    got = QUERIES["q176_kmv_set_sketches"].builder(spark, SF_DIR).collect()
    assert got, "no type pairs"
    for r in got:
        a, b = users[r["type_a"]], users[r["type_b"]]
        for est, exact in (
            (r["est_a"], len(a)),
            (r["est_b"], len(b)),
            (r["est_union"], len(a | b)),
            (r["est_intersection"], len(a & b)),
        ):
            if exact < 128:
                # small sets are represented exactly in the sketch
                assert abs(est - exact) / max(exact, 1) < 0.35, r
            else:
                assert abs(est - exact) / exact < 0.35, r


def test_q177_equals_q20(spark):
    """The two-pass distinct-agg rewrite is value-identical to the native
    Expand plan."""
    a = [tuple(r) for r in QUERIES["q20_distinct_agg"].builder(spark, SF_DIR).collect()]
    b = [
        tuple(r)
        for r in QUERIES["q177_distinct_agg_twopass"].builder(spark, SF_DIR).collect()
    ]
    assert a == b


def test_no_singleton_coalesce_on_large_outputs(spark):
    """Registry-wide presentation audit: a query whose RESULT scales with
    the data must not present-sort via coalesce(1) — that collapses the
    entire upstream pipeline onto one task (the t05 regression fixed in
    round 3). Small aggregated outputs may keep present_sorted."""
    from highs_duckdb_spark.operators import QUERIES as ALL

    # at sf0.001 the corpus tables hold ~1-6k rows; anything emitting more
    # than this many rows is per-row-scale, not an aggregate summary
    THRESHOLD = 1500
    offenders = []
    for name, spec in sorted(ALL.items()):
        if name.startswith(("qs", "opt")):
            continue  # streaming/solver entries execute at build time
        df = spec.builder(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "Coalesce 1" not in plan and "Coalesce(1)" not in plan:
            continue
        if df.count() > THRESHOLD:
            offenders.append(name)
    assert not offenders, (
        f"corpus-sized outputs presented through coalesce(1): {offenders} — "
        "switch them to ordered_wide (parallel range sort)"
    )


def test_native_approx_percentile_bounds(spark):
    exact = _rows(spark, "q62_percentiles")
    est = _rows(spark, "q173_native_approx_percentile")
    for prio, (p50, p90) in exact.items():
        e50, e90 = est[prio]
        assert abs(e50 - p50) / p50 < 0.1  # accuracy=1000 -> <=0.1% rank error
        assert abs(e90 - p90) / p90 < 0.1
