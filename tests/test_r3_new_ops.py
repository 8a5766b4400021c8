"""Constructed-input tests for d13 (substring-span dedup) and p15 (mixture
LP) — semantics pinned on hand-computable corpora, independent of the
driver fixtures the oracle-parity suite uses."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

# 62 distinct chars: a string with no repeated character has no internal
# duplicate grams of any length > 1
_ALPHABET = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
SHARED = _ALPHABET[:60]  # cross-doc duplicate region (60 chars)
SEG = "!#$%&()*+,./:;<=>?@[]^_`{|}~" + "0a1b2c3d4e5f6g7h8"  # 45 distinct chars


def _write_docs(tmp_path):
    assert len(SEG) == 45 and len(set(SHARED)) == 60
    rows = [
        (1, "X" * 10 + SHARED + "Y" * 10),  # len 80, shared at 11..70
        (2, "Z" * 25 + SHARED + "W" * 5),  # len 90, shared at 26..85
        (3, "q" + _ALPHABET[::-1]),  # len 63, no substring shared with others
        (4, SEG + "-" * 5 + SEG),  # len 95, within-doc repeat
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"] = "en"
    df["source"] = "srcT"
    df["n_chars"] = df["text"].str.len()
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_d13_spans_on_constructed_corpus(spark, tmp_path):
    from highs_duckdb_spark.operators.dedup import d13_substring_span_dedup

    sf_dir = _write_docs(tmp_path)
    got = {
        r["doc_id"]: (r["n_dup_grams"], r["n_spans"], r["dup_chars"], r["dup_ratio"])
        for r in d13_substring_span_dedup(spark, sf_dir).collect()
    }
    # doc 1: shared occupies 11..70; 40-grams fully inside start at 11..31
    assert got[1] == (21, 1, 60, round(1e-9 + 60 / 80, 4))
    # doc 2: shared at 26..85; starts 26..46
    assert got[2] == (21, 1, 60, round(1e-9 + 60 / 90, 4))
    # doc 3: all characters distinct from every other doc -> no dup grams
    assert 3 not in got
    # doc 4: SEG repeats at 1..45 and 51..95; 6 grams per copy, two spans
    assert got[4] == (12, 2, 90, round(1e-9 + 90 / 95, 4))


def test_p15_lp_equals_greedy_closed_form():
    """The mixture LP is a fractional knapsack: for random instances with
    distinct qualities, the simplex optimum must equal the greedy fill."""
    from highs_duckdb_spark.optim.simplex import solve_lp

    rng = np.random.default_rng(7)
    for trial in range(25):
        n = int(rng.integers(2, 12))
        supply = rng.integers(10, 1000, size=n).astype(float)
        q = rng.permutation(np.linspace(0.1, 0.9, n) + rng.uniform(0, 1e-3, n))
        budget = float(rng.uniform(0, supply.sum()))
        res = solve_lp(
            c=(-q).tolist(),
            a_dense=[1.0] * n,
            row_lb=[0.0],
            row_ub=[budget],
            col_lb=[0.0] * n,
            col_ub=supply.tolist(),
        )
        assert res.status == "Optimal", (trial, res.status)
        # greedy: fill sources by quality descending until the budget is gone
        want = np.zeros(n)
        left = budget
        for i in sorted(range(n), key=lambda i: -q[i]):
            take = min(supply[i], left)
            want[i] = take
            left -= take
        assert np.allclose(res.x, want, atol=1e-6), (trial, res.x, want)
        assert res.objective == pytest.approx(-(q @ want), abs=1e-6)
