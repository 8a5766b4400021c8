"""Workload-driven projection advisor.

Host DuckDB — and the reference extension, which inherits its optimizer
(SURVEY.md §4.2; src/highs_extension.cpp registers functions and leaves all
planning to the host) — leaves "which materialization would serve this
workload" to DBA tooling (Vertica's Database Designer, SQL Server's
AutoAdmin, pg_qualstats-style advisors).  This module is that advisor for
the ``JoinGraph`` workload:

1. **Capture** — :func:`capture_workloads` installs a sink on
   ``plans.cbo``; every ``JoinGraph.plan()`` call appends its declared
   graph (facts with catalog statistics, edges, dims, and — when a layout
   is attached — the planner's own projection matches AND machine-readable
   decline reasons).  :func:`capture_registry` drives it over every
   registered query builder without executing the results.

2. **Aggregate** — :func:`pair_candidates` folds the captured graphs into
   candidate projection specs: every matchable fact-pair equi-join that
   recurs across queries, with the UNION of columns those queries touch,
   a suggested clustering key (the most frequent downstream join key),
   and a byte-saving estimate.  :func:`spec_coverage` reads the planner's
   authoritative match/decline records for the projections that already
   exist and emits the exact column widening that would serve each
   declined query (``missing_columns:`` reasons).

3. **Decide elsewhere** — the estimates are RANKING heuristics (uniform
   column widths, FK-grain row counts); the adopt/decline decision stays
   with a measured A/B, the same discipline every layout change in this
   repo has followed (BENCH_SCALING).

The tool entry point is ``tools/projection_advisor.py``.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def capture_workloads():
    """Install a workload sink for the duration of the block; yields the
    list every ``JoinGraph.plan()`` call appends its record to."""
    from highs_duckdb_spark.plans import cbo

    sink: list[dict] = []
    prev = cbo._WORKLOAD_SINK
    cbo._WORKLOAD_SINK = sink
    try:
        yield sink
    finally:
        cbo._WORKLOAD_SINK = prev


def capture_registry(spark, sf_dir: str, names=None) -> list[dict]:
    """Build (NOT execute) every registered query under capture; each
    record is stamped with its query name.  Builders that raise are
    skipped (a handful need non-plain setup, e.g. streaming sources);
    their names are returned on the result's ``skipped`` attribute."""
    from highs_duckdb_spark.operators import QUERIES

    records: list[dict] = []
    skipped: list[str] = []
    for name in sorted(names or QUERIES):
        with capture_workloads() as sink:
            try:
                QUERIES[name].builder(spark, sf_dir)
            except Exception as exc:
                # the exception repr rides along so a real builder
                # regression is distinguishable from expected non-plain
                # setup (streaming sources etc.) when this capture is read
                # as a health sweep (VERDICT r07)
                skipped.append(f"{name} [{type(exc).__name__}: {exc}]"[:200])
                continue
        for r in sink:
            r["query"] = name
            records.append(r)
    records = list(records)
    # lightweight side-channel for the CLI (plain list otherwise)
    records_obj = _Records(records)
    records_obj.skipped = skipped
    return records_obj


class _Records(list):
    """A list of workload records with a ``skipped`` attribute."""

    skipped: list[str] = []


def table_info(sf_dir: str, tables) -> dict[str, dict]:
    """{table: {bytes, rows, ncols}} from parquet footers (pyarrow) — the
    catalog statistics the byte estimates scale from."""
    import os

    import pyarrow.parquet as pq

    from highs_duckdb_spark.plans.cbo import table_bytes
    from highs_duckdb_spark.sources.stats import _parquet_files

    out: dict[str, dict] = {}
    for t in sorted(set(tables)):
        path = os.path.join(sf_dir, f"{t}.parquet")
        files = _parquet_files(path)
        if not files:
            continue
        rows = 0
        for f in files:
            rows += pq.ParquetFile(f).metadata.num_rows
        ncols = pq.ParquetFile(files[0]).metadata.num_columns
        out[t] = {"bytes": table_bytes(sf_dir, t), "rows": rows, "ncols": ncols}
    return out


def _fact_needed_columns(record: dict, fact_name: str) -> set[str]:
    """Columns the query touches on one fact: its declared ``columns``
    plus every edge key incident to it (join keys are always needed)."""
    cols: set[str] = set()
    for f in record["facts"]:
        if f["name"] == fact_name and f["columns"] is not None:
            cols.update(f["columns"])
    for e in record["edges"]:
        if e["a"] == fact_name:
            cols.add(e["ka"])
        if e["b"] == fact_name:
            cols.add(e["kb"])
    return cols


def pair_candidates(records, tinfo: dict[str, dict] | None = None) -> list[dict]:
    """Aggregate captured graphs into ranked NEW-projection candidates.

    A candidate is a fact-pair equi-join (no extra predicate, neither side
    a stat proxy) where both facts opted in with ``columns=`` — the same
    class the matcher can serve.  Pairs already absorbed by an attached
    projection in a record are skipped for that record (they are served).

    Estimated saving per query = (bytes_a + bytes_b) − projected scan
    bytes, where the projection's row width assumes uniform column widths
    within each table (bytes/rows/ncols from ``tinfo``) and its row count
    is the FK grain (the larger side's unscaled rows).  Uniform width is
    crude — parquet column widths vary wildly — so this ranks, it does
    not decide (module doc)."""
    agg: dict[tuple, dict] = {}
    for rec in records:
        facts = {f["name"]: f for f in rec["facts"]}
        served = {
            frozenset(absorbed)
            for _p, absorbed in rec.get("projections", [])
        }
        for e in rec["edges"]:
            if e["extra"]:
                continue
            fa, fb = facts.get(e["a"]), facts.get(e["b"])
            if fa is None or fb is None:
                continue
            if fa["stat_proxy"] or fb["stat_proxy"]:
                continue
            if fa["columns"] is None or fb["columns"] is None:
                continue
            if frozenset((fa["name"], fb["name"])) in served:
                continue
            sides = sorted(
                [(fa["table"], e["ka"], fa), (fb["table"], e["kb"], fb)],
                key=lambda s: (s[0], s[1]),
            )
            key = ((sides[0][0], sides[0][1]), (sides[1][0], sides[1][1]))
            entry = agg.setdefault(
                key,
                {
                    "tables": (key[0][0], key[1][0]),
                    "on": (key[0][1], key[1][1]),
                    "queries": [],
                    "columns": {key[0][0]: set(), key[1][0]: set()},
                    "ext_keys": {},  # downstream join keys → frequency
                    "est_saving_bytes": 0.0,
                    "_stats_ok": True,
                },
            )
            entry["queries"].append(rec["query"])
            for t, _k, f in sides:
                entry["columns"][t] |= _fact_needed_columns(rec, f["name"])
            # downstream (external) edge keys on either fact → clustering
            # candidates: the key the projection's consumers join on
            pairset = {fa["name"], fb["name"]}
            for o in rec["edges"]:
                for end, k in ((o["a"], o["ka"]), (o["b"], o["kb"])):
                    if end in pairset and not (
                        {o["a"], o["b"]} == pairset
                    ):
                        entry["ext_keys"][k] = entry["ext_keys"].get(k, 0) + 1
            base = fa["bytes"] + fb["bytes"]
            proj = _proj_scan_bytes(sides, tinfo) if tinfo else None
            if proj is None:
                entry["_stats_ok"] = False
                entry["est_saving_bytes"] += base * 0.5  # stats-less guess
            else:
                entry["est_saving_bytes"] += max(base - proj, 0.0)
    out = []
    for entry in agg.values():
        entry["columns"] = {t: sorted(c) for t, c in entry["columns"].items()}
        entry["bucket_cols"] = (
            [max(entry["ext_keys"], key=lambda k: (entry["ext_keys"][k], k))]
            if entry["ext_keys"]
            else [entry["on"][0]]
        )
        entry["n_queries"] = len(entry["queries"])
        out.append(entry)
    out.sort(key=lambda c: (-c["est_saving_bytes"], c["tables"]))
    return out


def _proj_scan_bytes(sides, tinfo) -> float | None:
    """Sel-scaled scan bytes of the candidate projection for ONE query:
    FK-grain rows × uniform-width column subset, × the query's product
    selectivity."""
    rows_grain = 0.0
    width = 0.0
    sel = 1.0
    for t, _k, f in sides:
        ti = tinfo.get(t)
        if ti is None or not ti.get("rows") or f["rows"] is None or f["sel"] <= 0:
            return None
        unscaled = f["rows"] / f["sel"]
        rows_grain = max(rows_grain, unscaled)
        ncols_needed = max(len(f["columns"] or []), 1)
        width += ti["bytes"] / ti["rows"] * ncols_needed / max(ti["ncols"], 1)
        sel *= f["sel"]
    return rows_grain * width * sel


def spec_coverage(records) -> dict[str, dict]:
    """Authoritative per-projection coverage from the PLANNER's own
    capture (requires the layout attached during capture): which queries
    substituted each projection, which declined and why, and the union
    column widening that would serve the ``missing_columns`` declines."""
    out: dict[str, dict] = {}
    for rec in records:
        for pname, absorbed in rec.get("projections", []):
            e = out.setdefault(
                pname, {"served": [], "declined": [], "widen_columns": set()}
            )
            e["served"].append((rec["query"], tuple(absorbed)))
        for pname, reason in rec.get("declines", []):
            e = out.setdefault(
                pname, {"served": [], "declined": [], "widen_columns": set()}
            )
            e["declined"].append((rec["query"], reason))
            if reason.startswith("missing_columns:"):
                e["widen_columns"] |= set(
                    reason.split(":", 1)[1].split(",")
                )
    for e in out.values():
        e["widen_columns"] = sorted(e["widen_columns"])
    return out


def render_markdown(pairs, coverage, skipped=(), top=10) -> str:
    """The advisor report (markdown)."""
    lines = ["# Projection advisor report", ""]
    if coverage:
        lines.append("## Attached projections — coverage (planner-recorded)")
        lines.append("")
        for pname in sorted(coverage):
            e = coverage[pname]
            lines.append(f"### {pname}")
            served = sorted({q for q, _ in e["served"]})
            lines.append(f"- served ({len(served)}): {', '.join(served) or '—'}")
            if e["declined"]:
                lines.append(f"- declined ({len(e['declined'])}):")
                for q, reason in sorted(set(e["declined"])):
                    lines.append(f"  - {q}: `{reason}`")
            if e["widen_columns"]:
                lines.append(
                    "- **widening that would serve the declines**: "
                    f"`{', '.join(e['widen_columns'])}`"
                )
            lines.append("")
    lines.append("## New-projection candidates (ranked by estimated saving)")
    lines.append("")
    lines.append(
        "| tables | on | queries | est saving | suggested bucket | columns |"
    )
    lines.append("|---|---|---|---|---|---|")
    for c in pairs[:top]:
        cols = "; ".join(
            f"{t}: {', '.join(cs)}" for t, cs in sorted(c["columns"].items())
        )
        mark = "" if c["_stats_ok"] else " (no stats — guessed)"
        lines.append(
            f"| {c['tables'][0]} ⋈ {c['tables'][1]} "
            f"| {c['on'][0]} = {c['on'][1]} "
            f"| {c['n_queries']} "
            f"| {c['est_saving_bytes'] / 1e6:.1f} MB{mark} "
            f"| {', '.join(c['bucket_cols'])} "
            f"| {cols} |"
        )
    lines.append("")
    if skipped:
        lines.append(
            f"_Skipped builders (non-plain setup): {len(skipped)} — "
            f"{', '.join(sorted(skipped)[:12])}"
            f"{'…' if len(skipped) > 12 else ''}_"
        )
        lines.append("")
    lines.append(
        "_Estimates assume uniform column widths and FK-grain row counts; "
        "they rank candidates, they do not decide — adopt only behind a "
        "measured A/B (BENCH_SCALING discipline)._"
    )
    return "\n".join(lines)
