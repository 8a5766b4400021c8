"""Property/brute-force tests for the round-2 operators.

Where the driver oracle runs the SAME formulation on both engines (e.g.
the sweep line), these tests pin the semantics against an INDEPENDENT
naive implementation, so a shared-formulation bug can't pass unnoticed.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _duck(sf_dir=SF_DIR):
    con = duckdb.connect()
    for t in ("events", "part", "lineitem", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# ---------------------------------------------------------------------------
# q135 skyline vs brute force
# ---------------------------------------------------------------------------


def test_skyline_matches_brute_force(spark):
    from highs_duckdb_spark.operators.relational6 import q135_skyline_pareto

    got = {
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in q135_skyline_pareto(spark, SF_DIR).collect()
    }
    rows = _duck().execute(
        "SELECT p_partkey, p_retailprice, p_size FROM part"
    ).fetchall()
    expected = set()
    for k, pr, sz in rows:
        dominated = any(
            bpr <= pr and bsz >= sz and (bpr < pr or bsz > sz)
            for _, bpr, bsz in rows
        )
        if not dominated:
            expected.add((k, pr, sz))
    assert got == expected and len(expected) > 0


# ---------------------------------------------------------------------------
# q137 sweep line vs naive pairwise-overlap concurrency
# ---------------------------------------------------------------------------


def test_sweepline_matches_naive_concurrency(spark):
    from highs_duckdb_spark.operators.relational6 import q137_concurrency_sweepline

    got = {
        (str(r["day"]), r["max_concurrent"])
        for r in q137_concurrency_sweepline(spark, SF_DIR).collect()
    }
    rows = _duck().execute(
        "SELECT epoch_us(ts), CAST(floor(value*100 + 0.5) AS BIGINT)*10000 FROM events"
    ).fetchall()
    iv = [(s, s + d) for s, d in rows]
    D = 86_400_000_000
    # naive: at every interval start, count active intervals; take the max
    # per day of the start's clamped day segments
    import collections

    best: dict[int, int] = collections.defaultdict(int)
    starts = sorted(
        {max(s, (s // D) * D) for s, e in iv}
        | {s for s, e in iv}
        | {(s // D + 1) * D for s, e in iv if e > (s // D + 1) * D}
    )
    for t in starts:
        active = sum(1 for s, e in iv if s <= t < e)
        best[t // D] = max(best[t // D], active)
    expected = set()
    for day, mx in best.items():
        import datetime

        d = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=day * D
        )
        expected.add((d.date().isoformat(), mx))
    assert got == expected


# ---------------------------------------------------------------------------
# q139 weighted median vs direct accumulation
# ---------------------------------------------------------------------------


def test_weighted_median_matches_direct(spark):
    from highs_duckdb_spark.operators.relational6 import q139_weighted_median

    got = {
        (r["l_returnflag"], r["weighted_median"])
        for r in q139_weighted_median(spark, SF_DIR).collect()
    }
    rows = _duck().execute(
        """SELECT l_returnflag, l_extendedprice,
                  CAST(floor(l_quantity*100 + 0.5) AS BIGINT),
                  l_orderkey, l_linenumber FROM lineitem"""
    ).fetchall()
    groups: dict[str, list] = {}
    for rf, price, wt, ok, ln in rows:
        groups.setdefault(rf, []).append((price, ok, ln, wt))
    for rf, items in groups.items():
        items.sort()
        tot = sum(w for *_, w in items)
        cum = 0
        med = None
        for price, _, _, w in items:
            cum += w
            if 2 * cum >= tot:
                med = price
                break
        assert (rf, med) in got
    assert len(got) == len(groups)


# ---------------------------------------------------------------------------
# q138 AUC vs sklearn-style pairwise definition
# ---------------------------------------------------------------------------


def test_auc_matches_pairwise_definition(spark):
    from highs_duckdb_spark.operators.relational6 import q138_auc_mann_whitney

    row = q138_auc_mann_whitney(spark, SF_DIR).collect()[0]
    rows = _duck().execute(
        "SELECT value, event_type = 'purchase' FROM events"
    ).fetchall()
    pos = [v for v, p in rows if p]
    neg = [v for v, p in rows if not p]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    auc = wins / (len(pos) * len(neg))
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert abs(row["auc"] - auc) < 1e-6


# ---------------------------------------------------------------------------
# q140 band join vs naive double loop
# ---------------------------------------------------------------------------


def test_band_join_matches_naive(spark):
    from highs_duckdb_spark.operators.relational6 import q140_bucketed_band_join

    got = {
        (r["event_id"], r["n_nearby"])
        for r in q140_bucketed_band_join(spark, SF_DIR).collect()
    }
    rows = _duck().execute(
        "SELECT event_id, epoch_us(ts), event_type FROM events"
    ).fetchall()
    ts = [(eid, t) for eid, t, _ in rows]
    expected = set()
    for eid, t, et in rows:
        if et != "error":
            continue
        n = sum(1 for oid, ot in ts if abs(ot - t) <= 60_000_000) - 1
        expected.add((eid, n))
    assert got == expected


# ---------------------------------------------------------------------------
# t18 Jaro-Winkler kernel ≡ DuckDB native on randomized strings
# ---------------------------------------------------------------------------


def test_jaro_winkler_kernel_matches_duckdb():
    from highs_duckdb_spark.operators.text2 import jaro_winkler

    con = duckdb.connect()
    rng = random.Random(271828)
    pairs = []
    for i in range(2000):
        n1, n2 = rng.randint(0, 9), rng.randint(0, 9)
        s1 = "".join(rng.choices("abcde ", k=n1))
        s2 = "".join(rng.choices("abcde ", k=n2))
        if i % 5 == 0:
            s2 = s1
        pairs.append((s1, s2))
    # the PRODUCTION kernel (imported, not copied — drift in text2.py fails
    # this test directly) vs DuckDB's native function
    for s1, s2 in pairs:
        d = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        assert abs(d - jaro_winkler(s1, s2)) < 1e-12, (s1, s2, d)


def test_t18_two_char_block_recall_unchanged():
    """The r9 2-char-prefix block (VERDICT r08 item 8 — key space ~676x5
    instead of ~26x5, removing the heavy-first-letter skew ceiling) is
    candidate-generation only: at threshold 0.88 the surviving pair SET
    must equal the 1-char block's on the actual data."""
    con = _duck()
    tmpl = """
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name x, b.p_name y FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND left(a.p_name, {n}) = left(b.p_name, {n})
     AND abs(length(a.p_name) - length(b.p_name)) <= 2
    WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.88
    """
    p1 = set(con.execute(tmpl.format(n=1)).fetchall())
    p2 = set(con.execute(tmpl.format(n=2)).fetchall())
    assert p1 == p2 and len(p1) > 0


# ---------------------------------------------------------------------------
# dq11 Misra-Gries candidate guarantee under adversarial batch splits
# ---------------------------------------------------------------------------


def test_misra_gries_candidates_superset():
    import re

    K = 400
    rows = _duck().execute("SELECT text FROM documents").fetchall()
    texts = [t for (t,) in rows]

    ascii_ws = " \t\n\x0b\x0c\r"

    def mg(stream_texts):
        counters: dict[str, int] = {}
        n = 0
        for text in stream_texts:
            toks = re.split(r"\s+", text.strip(ascii_ws).lower(), flags=re.ASCII)
            n += len(toks)
            for t in toks:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < K:
                    counters[t] = 1
                else:
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        return set(counters), n

    import collections

    exact = collections.Counter()
    for t in texts:
        exact.update(re.split(r"\s+", t.strip(ascii_ws).lower(), flags=re.ASCII))
    total = sum(exact.values())
    heavies = {t for t, c in exact.items() if c * 200 > total}
    assert heavies, "test corpus should have 0.5% heavy hitters"

    rng = random.Random(31415)
    for trial in range(3):  # adversarial-ish random splits
        shuffled = texts[:]
        rng.shuffle(shuffled)
        n_batches = rng.choice([1, 3, 7])
        cands: set[str] = set()
        size = math.ceil(len(shuffled) / n_batches)
        for b in range(n_batches):
            s, _ = mg(shuffled[b * size : (b + 1) * size])
            cands |= s
        assert heavies <= cands, f"trial {trial}: MG candidates missed a heavy"


# ---------------------------------------------------------------------------
# qs12 streaming SCD2 is insensitive to arrival order (vs q78 batch)
# ---------------------------------------------------------------------------


def test_stream_scd2_equals_batch(spark):
    from highs_duckdb_spark.operators.merge_ops import q78_scd2_history
    from highs_duckdb_spark.operators.streaming_ops import qs12_stream_scd2

    batch = [tuple(r) for r in q78_scd2_history(spark, SF_DIR).collect()]
    streamed = [tuple(r) for r in qs12_stream_scd2(spark, SF_DIR).collect()]
    assert batch == streamed


# ---------------------------------------------------------------------------
# t20 encoding audit: the corpus is clean ASCII, so pin the detection
# kernel on adversarial strings against DuckDB's regexp on the same text
# ---------------------------------------------------------------------------


def test_encoding_audit_kernel_on_mojibake(spark):
    import pyspark.sql.functions as F

    samples = [
        (0, "plain ascii text"),
        (1, "bad\x00byte and\x1fcontrol"),
        (2, "repl � char � twice"),
        (3, "café naïve 中文"),
        (4, "tab\tand\nnewline kept clean"),
    ]
    df = spark.createDataFrame(samples, "doc_id long, text string")

    def n_matches(pat):
        return F.length(F.col("text")) - F.length(
            F.regexp_replace(F.col("text"), pat, "")
        )

    got = {
        r["doc_id"]: (r["c"], r["r"], r["na"])
        for r in df.select(
            "doc_id",
            n_matches(r"[\x00-\x08\x0B\x0C\x0E-\x1F]").alias("c"),
            n_matches("�").alias("r"),
            n_matches(r"[^\x00-\x7F]").alias("na"),
        ).collect()
    }
    con = duckdb.connect()
    for doc_id, text in samples:
        c, r, na = con.execute(
            """SELECT length(regexp_extract_all(?, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')),
                      length(regexp_extract_all(?, '\\x{FFFD}')),
                      length(regexp_extract_all(?, '[^\\x00-\\x7F]'))""",
            [text, text, text],
        ).fetchone()
        assert got[doc_id] == (c, r, na), (doc_id, got[doc_id], (c, r, na))
    assert got[1][0] == 2 and got[2][1] == 2 and got[3][2] == 4 and got[4] == (0, 0, 0)


# ---------------------------------------------------------------------------
# opt13 RHS ranging: duals invariant inside the range, changed outside
# ---------------------------------------------------------------------------


def test_rhs_ranging_basis_invariance():
    import numpy as np

    from highs_duckdb_spark.optim.simplex import rhs_ranging, solve_lp

    c = [-1.0, -1.0]
    a = [[1.0, 2.0], [3.0, 1.0]]
    base = solve_lp(c, a, [-1e30, -1e30], [7.0, 9.0], [0.0, 0.0], [1e30, 1e30])
    ranges = rhs_ranging(base)
    assert base.status == "Optimal"
    for i, rhs in enumerate([7.0, 9.0]):
        lo_off, hi_off = ranges[i]
        lo, hi = rhs + lo_off, rhs + hi_off
        for probe in (lo + 1e-6, (lo + hi) / 2, hi - 1e-6):  # inside: duals equal
            ub = [7.0, 9.0]
            ub[i] = probe
            r = solve_lp(c, a, [-1e30, -1e30], ub, [0.0, 0.0], [1e30, 1e30])
            assert r.status == "Optimal"
            assert np.allclose(r.row_duals, base.row_duals, atol=1e-7), (i, probe)
        for probe in (lo - 0.5, hi + 0.5):  # outside: dual solution changes
            ub = [7.0, 9.0]
            ub[i] = probe
            r = solve_lp(c, a, [-1e30, -1e30], ub, [0.0, 0.0], [1e30, 1e30])
            assert r.status != "Optimal" or not np.allclose(
                r.row_duals, base.row_duals, atol=1e-7
            ), (i, probe)


# ---------------------------------------------------------------------------
# rhs_ranging property: on random solvable LPs, duals are invariant at
# interior probes of every reported range
# ---------------------------------------------------------------------------


def test_rhs_ranging_property_random_lps():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from highs_duckdb_spark.optim.simplex import rhs_ranging, solve_lp

    coef = st.integers(min_value=-3, max_value=3)

    @settings(max_examples=60, deadline=None, derandomize=True)
    @given(
        c=st.lists(coef, min_size=2, max_size=3),
        rows=st.lists(
            st.tuples(st.lists(coef, min_size=3, max_size=3), st.integers(1, 12)),
            min_size=1,
            max_size=3,
        ),
    )
    def check(c, rows):
        n = len(c)
        a = [r[0][:n] for r in rows]
        ub = [float(r[1]) for r in rows]
        lb = [-1e30] * len(rows)
        res = solve_lp(c, a, lb, ub, [0.0] * n, [5.0] * n)
        if res.status != "Optimal":
            return
        ranges = rhs_ranging(res)
        for i, (lo_off, hi_off) in ranges.items():
            lo = ub[i] + max(lo_off, -50.0)
            hi = ub[i] + min(hi_off, 50.0)
            if hi - lo < 1e-6:
                continue  # degenerate range: probing is numerically moot
            mid = (lo + hi) / 2
            ub2 = list(ub)
            ub2[i] = mid
            r2 = solve_lp(c, a, lb, ub2, [0.0] * n, [5.0] * n)
            assert r2.status == "Optimal", (c, a, ub, i, mid)
            assert np.allclose(r2.row_duals, res.row_duals, atol=1e-6), (
                c,
                a,
                ub,
                i,
                mid,
            )

    check()
