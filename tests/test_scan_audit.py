"""Registry-wide physical-plan audit: no query may scan a fact table more
than twice unless it is on the documented allowlist below.

Spark re-executes the entire subtree for every reference to a derived
DataFrame (there is no automatic CTE materialization), so an innocent
`df` used three times becomes three scans of its source at 100 TB. The
fixes are structural — chained windows instead of per-stage joins (q26),
marginals of one aggregate instead of parallel aggregates (t11), window
totals instead of aggregate self-joins (dq06), checkpoints before
self-joins (g02, s06) — and this audit keeps them from regressing.
"""

from __future__ import annotations

import pytest

from highs_duckdb_spark.operators import QUERIES
from highs_duckdb_spark.session import TABLES

SF = "/root/testdata/sf0.001"

BIG_TABLES = (
    "lineitem",
    "orders",
    "events",
    "documents",
    "embeddings",
    "customer",
    "part",
    "supplier",
)

# Queries allowed >2 scans of some big table, each with the reason the
# multiplicity is inherent to the operator's semantics (N independent
# probes / set operands), not an accidental recompute.
ALLOWED = {
    "d06_dedup_corpus": "fingerprint ranking + survivor join + summary: 3 passes by contract",
    "dq03_referential_integrity": "one anti-join probe per FK edge; each edge is a separate audit",
    "opt05_solve_many_bulk": "three VALUES-table encodings derive from the same dimension scan",
    "q09_scalar_subquery_projection": "scalar + IN subqueries are semantically separate aggregates",
    "q18_bag_set_ops": "INTERSECT ALL/EXCEPT ALL operands are four distinct bag expressions",
    "q82_gap_fill": "bounds + calendar + values: the gap-fill three-pass shape",
    "q88_union_all_bag_ops": "six bag-semantics operands over the same table by construction",
    "q89_tfidf_top_terms": "tf pass + df pass + totals: the textbook two-pass TF-IDF",
    "t09_bigram_lm_score": "LM training pass + scoring pass (model-then-apply)",
}

# Streaming queries run a real stream at build time; optimization queries
# run the solver. Excluded from the plan audit (their plans are trivial
# memory-sink / createDataFrame reads).
SKIP_PREFIXES = ("qs", "opt")


def _scan_counts(spark, df):
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    counts: dict[str, int] = {}
    for line in plan.splitlines():
        if "FileScan" in line or "Scan parquet" in line:
            for t in TABLES:
                if f"{t}.parquet" in line:
                    counts[t] = counts.get(t, 0) + 1
    return counts


@pytest.mark.parametrize(
    "name",
    sorted(n for n in QUERIES if not n.startswith(SKIP_PREFIXES)),
)
def test_no_unexplained_rescans(spark, name):
    df = QUERIES[name].builder(spark, SF)
    counts = _scan_counts(spark, df)
    heavy = {t: c for t, c in counts.items() if t in BIG_TABLES and c > 2}
    if heavy:
        reason = ALLOWED.get(name)
        assert reason, (
            f"{name} scans {heavy} — either restructure (chained windows / "
            "marginals / checkpoint) or add an ALLOWED entry with the reason"
        )
