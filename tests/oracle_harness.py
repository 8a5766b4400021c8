"""Local replica of the driver's DuckDB-oracle comparison: run the Spark
query and its oracle SQL side by side, compare row count, column names, and
order-insensitive values (with per-cell float normalization)."""

from __future__ import annotations

import math

import duckdb

from highs_duckdb_spark.session import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and fp dust beyond round-trip precision
        return round(v + 0.0, 9)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    import decimal

    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str):
    """Return (ok, message). Sorts columns by name then rows, like the driver."""
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    if sorted(s_cols) != sorted(o_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    o_order = [o_cols.index(c) for c in sorted(o_cols)]

    def sort_key(t):  # None-safe, mixed-type-safe total order
        return tuple((v is None, str(type(v)), str(v)) for v in t)

    s_norm = sorted(
        (tuple(_norm_cell(r[i]) for i in s_order) for r in s_rows), key=sort_key
    )
    o_norm = sorted(
        (tuple(_norm_cell(r[i]) for i in o_order) for r in o_rows), key=sort_key
    )
    for i, (a, b) in enumerate(zip(s_norm, o_norm)):
        if a != b:
            return False, f"first value mismatch at sorted row {i}: spark={a!r} oracle={b!r}"
    return True, "ok"
