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
    ``(name, reason)`` tuples are returned on the result's ``skipped``
    attribute."""
    from highs_duckdb_spark.operators import QUERIES

    records: list[dict] = []
    skipped: list[str] = []
    for name in sorted(names or QUERIES):
        with capture_workloads() as sink:
            try:
                QUERIES[name].builder(spark, sf_dir)
            except Exception as exc:
                # (name, reason) tuples keep the bare name machine-readable
                # (set membership vs registry names) while the reason lets a
                # health-sweep reader distinguish a real builder regression
                # from expected non-plain setup (streaming sources etc.)
                reason = f"{type(exc).__name__}: {exc}"[:160]
                skipped.append((name, reason))
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
        if rec.get("kind") == "topk":
            continue  # scan declarations, not join graphs
        if rec.get("agg_mv") is not None:
            continue  # the whole graph is MV-served: nothing to absorb
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


def _grain_ndv(sf_dir: str, tables, col: str) -> float | None:
    """NDV of ``col`` looked up across the candidate's tables' primary
    sidecars; ``year(src)`` derived columns estimate as the year SPAN of
    the source column's file zones. None = no stat anywhere (the
    candidate is still proposed, marked stats-incomplete)."""
    from highs_duckdb_spark.sources import stats as zstats

    if col.startswith("year(") and col.endswith(")"):
        src = col[5:-1]
        for t in tables:
            stats, _ = zstats.primary_sidecar(sf_dir, t)
            if stats is None:
                continue
            years = set()
            for f in stats.get("files", []):
                c = f.get("columns", {}).get(src)
                if not c:
                    continue
                lo, hi = zstats._decode(c["min"]), zstats._decode(c["max"])
                if hasattr(lo, "year") and hasattr(hi, "year"):
                    years.add(lo.year)
                    years.add(hi.year)
            if years:
                return float(max(years) - min(years) + 1)
        return None
    for t in tables:
        stats, _ = zstats.primary_sidecar(sf_dir, t)
        if stats is None:
            continue
        ndv = zstats.column_ndv(stats, col)
        if ndv:
            return ndv
    return None


def agg_mv_candidates(records, sf_dir: str | None = None) -> list[dict]:
    """Rank AGGREGATE-MV candidates from captured ``aggregate()``
    declarations (VERDICT r07 item 6) — the advisor-side inverse of
    ``JoinGraph._match_agg_mv``: for each unserved aggregating query
    whose graph is fully structural (facts opted in with declarative
    filters, dims with ``on=``), propose the spec that would serve it —
    tables = facts + dims, joins = edges + dim joins, group grain =
    final keys ∪ dim join/equality keys ∪ ``year(col)`` for range-
    filtered columns — and estimate the MV's row grain as the NDV
    product of the grain keys (the go/no-go number: a grain near the
    fact's row count materializes nothing). Identical proposals from
    several queries aggregate; ranking = total absorbed scan bytes,
    grain rows attached. Estimates rank, they do not decide (module
    doc)."""
    agg: dict[tuple, dict] = {}
    for rec in records:
        a = rec.get("aggregate")
        if not a or rec.get("agg_mv") is not None:
            continue
        facts = rec["facts"]
        if len(facts) < 2:
            continue
        structural = all(
            not f["stat_proxy"]
            and f["columns"] is not None
            and (not f["has_prepare"] or f.get("range_filter") is not None)
            for f in facts
        ) and all(d.get("on") is not None for d in rec["dims"])
        if not structural:
            continue
        if any(e["extra"] for e in rec["edges"]):
            continue
        tables = tuple(sorted(f["table"] for f in facts))
        included = [d for d in rec["dims"]
                    if d.get("catalog_rows") and d["how"] == "inner"]
        dim_tables = tuple(sorted(d["table"] for d in included))
        # joins must reference only relations present in tables/dim_tables
        # (ADVICE r08: an all-dims joins tuple proposed specs naming tables
        # the candidate doesn't include, e.g. region via n2_region)
        joins = tuple(
            sorted(
                [tuple(sorted((e["ka"], e["kb"]))) for e in rec["edges"]]
                + [tuple(sorted(d["on"])) for d in included]
            )
        )
        grain: set[str] = set(a["keys"])
        for d in rec["dims"]:
            if d.get("extra_eq"):
                grain |= set(d["extra_eq"])
            if d not in included:
                # an excluded dim still joins AGAINST the MV later — its
                # tree-side key (on[0]) must survive in the MV grain
                grain.add(d["on"][0])
        for f in facts:
            if f.get("range_filter") is not None:
                grain.add(f"year({f['range_filter'][0]})")
        aggs = tuple(sorted((fn, canon) for _al, fn, canon, _c in a["aggs"]))
        key = (tables, dim_tables, joins, tuple(sorted(grain)), aggs)
        entry = agg.setdefault(
            key,
            {
                "tables": list(tables),
                "dim_tables": list(dim_tables),
                "joins": [list(j) for j in joins],
                "group_keys": sorted(grain),
                "aggs": [list(x) for x in aggs],
                "queries": [],
                "absorbed_bytes": 0.0,
                "grain_rows": None,
            },
        )
        entry["queries"].append(rec["query"])
        # absorbed scan = the UNSCALED fact bytes the MV replaces per run
        entry["absorbed_bytes"] += sum(
            f["bytes"] / max(f["sel"], 1e-9) for f in facts
        )
        if sf_dir is not None and entry["grain_rows"] is None:
            rows = 1.0
            ok = True
            for gcol in entry["group_keys"]:
                ndv = _grain_ndv(sf_dir, tables + dim_tables, gcol)
                if ndv is None:
                    ok = False
                    break
                rows *= ndv
            entry["grain_rows"] = rows if ok else None
    out = list(agg.values())
    for e in out:
        e["n_queries"] = len(e["queries"])
    out.sort(key=lambda c: (-c["absorbed_bytes"], c["tables"]))
    return out


def topk_copy_candidates(records) -> list[dict]:
    """Rank VALUE-CLUSTERED-COPY candidates from captured top-k scan
    declarations (VERDICT r08 item 3): ``layout.topk_scan`` records every
    ORDER-BY/LIMIT declaration (kind="topk") with whether a clustered
    copy already served it. For each UNSERVED (table, column, direction)
    the candidate is the copy ``layout.build_value_clustered`` would
    build — the layout under which the zone-map planner prunes the scan
    to ~k rows' worth of row groups, where the primary sidecar's
    threshold provably can't prune unclustered files (the round-8
    committed negative). Ranked by recurrence × absorbed scan bytes;
    estimates rank, they do not decide (module doc)."""
    agg: dict[tuple, dict] = {}
    for rec in records:
        if rec.get("kind") != "topk":
            continue
        key = (rec["table"], rec["column"], bool(rec["descending"]))
        entry = agg.setdefault(
            key,
            {
                "table": rec["table"],
                "column": rec["column"],
                "descending": bool(rec["descending"]),
                "queries": [],
                "served": [],
                "absorbed_bytes": 0.0,
                "max_k": 0,
            },
        )
        (entry["served"] if rec.get("clustered_copy") else entry["queries"]).append(
            rec["query"]
        )
        if not rec.get("clustered_copy"):
            # the copy absorbs ~the whole unpruned scan per run
            entry["absorbed_bytes"] += float(rec.get("bytes") or 0.0)
        entry["max_k"] = max(entry["max_k"], int(rec["k"]))
    out = list(agg.values())
    for e in out:
        e["n_queries"] = len(e["queries"])
        e["n_served"] = len(e["served"])
    out.sort(key=lambda c: (-c["absorbed_bytes"], c["table"], c["column"]))
    return out


def chain_candidates(records, min_queries: int = 2) -> list[dict]:
    """3-table CHAIN projection candidates from recurring connected fact
    triples (VERDICT r07 item 6): two extra-free equi-edges sharing a
    middle fact, all three opted in with ``columns=`` — the class the
    chain view-matcher (cbo._match_projection over ``tables``/``joins``
    specs) can serve. Ranked by recurrence × absorbed bytes; candidates
    below ``min_queries`` recurrences are dropped (a one-query chain is
    a query rewrite, not a layout object)."""
    agg: dict[tuple, dict] = {}
    for rec in records:
        if rec.get("kind") == "topk":
            continue  # scan declarations, not join graphs
        if rec.get("agg_mv") is not None:
            continue  # the whole graph is MV-served: nothing to absorb
        facts = {f["name"]: f for f in rec["facts"]}
        edges = [
            e for e in rec["edges"]
            if not e["extra"]
            and e["a"] in facts and e["b"] in facts
            and not facts[e["a"]]["stat_proxy"]
            and not facts[e["b"]]["stat_proxy"]
            and facts[e["a"]]["columns"] is not None
            and facts[e["b"]]["columns"] is not None
        ]
        for i, e1 in enumerate(edges):
            for e2 in edges[i + 1:]:
                shared = {e1["a"], e1["b"]} & {e2["a"], e2["b"]}
                if len(shared) != 1:
                    continue
                names = sorted({e1["a"], e1["b"], e2["a"], e2["b"]})
                tables = tuple(sorted(facts[n]["table"] for n in names))
                joins = tuple(sorted(
                    tuple(sorted((e["ka"], e["kb"]))) for e in (e1, e2)
                ))
                entry = agg.setdefault(
                    (tables, joins),
                    {
                        "tables": list(tables),
                        "joins": [list(j) for j in joins],
                        "columns": {t: set() for t in tables},
                        "queries": [],
                        "absorbed_bytes": 0.0,
                    },
                )
                entry["queries"].append(rec["query"])
                for n in names:
                    entry["columns"][facts[n]["table"]] |= _fact_needed_columns(
                        rec, n
                    )
                entry["absorbed_bytes"] += sum(
                    facts[n]["bytes"] / max(facts[n]["sel"], 1e-9) for n in names
                )
    out = [
        {**e, "columns": {t: sorted(c) for t, c in e["columns"].items()},
         "n_queries": len(e["queries"])}
        for e in agg.values()
        if len(e["queries"]) >= min_queries
    ]
    out.sort(key=lambda c: (-c["absorbed_bytes"], c["tables"]))
    return out


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


def mv_coverage(records) -> dict[str, dict]:
    """Per-aggregate-MV coverage from the planner's own capture: which
    queries each attached MV served, and the per-MV decline reasons
    (same authority as :func:`spec_coverage` for projections)."""
    out: dict[str, dict] = {}
    for rec in records:
        mv = rec.get("agg_mv")
        if mv is not None:
            e = out.setdefault(mv[0], {"served": [], "declined": []})
            e["served"].append(rec["query"])
        for mname, reason in rec.get("agg_mv_declines", []):
            e = out.setdefault(mname, {"served": [], "declined": []})
            e["declined"].append((rec["query"], reason))
    return out


def render_markdown(
    pairs, coverage, skipped=(), top=10, agg_mvs=(), chains=(), mv_cov=None,
    topk_copies=(),
) -> str:
    """The advisor report (markdown)."""
    lines = ["# Projection advisor report", ""]
    if topk_copies:
        cands = [c for c in topk_copies if c["n_queries"]]
        served = [c for c in topk_copies if not c["n_queries"]]
        if cands:
            lines.append(
                "## Value-clustered copy candidates (from captured top-k scans)"
            )
            lines.append("")
            lines.append(
                "| table.column | direction | max k | queries | absorbed scan |"
            )
            lines.append("|---|---|---|---|---|")
            for c in cands[:top]:
                lines.append(
                    f"| {c['table']}.{c['column']} "
                    f"| {'DESC' if c['descending'] else 'ASC'} "
                    f"| {c['max_k']} "
                    f"| {c['n_queries']} "
                    f"| {c['absorbed_bytes'] / 1e6:.1f} MB |"
                )
            lines.append("")
        if served:
            lines.append("## Top-k scans served by a built value-clustered copy")
            lines.append("")
            for c in served:
                lines.append(
                    f"- {c['table']}.{c['column']} "
                    f"({'DESC' if c['descending'] else 'ASC'}, "
                    f"{c['n_served']} declaration(s): "
                    f"{', '.join(sorted(set(c['served'])))})"
                )
            lines.append("")
    if mv_cov:
        lines.append("## Attached aggregate MVs — coverage (planner-recorded)")
        lines.append("")
        for mname in sorted(mv_cov):
            e = mv_cov[mname]
            lines.append(f"### {mname}")
            lines.append(
                f"- served ({len(e['served'])}): "
                f"{', '.join(sorted(e['served'])) or '—'}"
            )
            if e["declined"]:
                lines.append(f"- declined ({len(e['declined'])}):")
                for q, reason in sorted(set(e["declined"])):
                    lines.append(f"  - {q}: `{reason}`")
            lines.append("")
    if agg_mvs:
        lines.append("## Aggregate-MV candidates (from captured aggregates)")
        lines.append("")
        lines.append("| tables (+dims) | group grain | grain rows | queries | absorbed scan |")
        lines.append("|---|---|---|---|---|")
        for c in agg_mvs[:top]:
            gr = (
                f"{c['grain_rows']:.0f}" if c["grain_rows"] is not None else "?"
            )
            lines.append(
                f"| {' ⋈ '.join(c['tables'])}"
                f"{' (+' + ', '.join(c['dim_tables']) + ')' if c['dim_tables'] else ''} "
                f"| {', '.join(c['group_keys'])} "
                f"| {gr} "
                f"| {c['n_queries']} "
                f"| {c['absorbed_bytes'] / 1e6:.1f} MB |"
            )
        lines.append("")
    if chains:
        lines.append("## Chain-projection candidates (recurring fact triples)")
        lines.append("")
        lines.append("| tables | joins | queries | absorbed scan |")
        lines.append("|---|---|---|---|")
        for c in chains[:top]:
            lines.append(
                f"| {' ⋈ '.join(c['tables'])} "
                f"| {'; '.join('='.join(j) for j in c['joins'])} "
                f"| {c['n_queries']} "
                f"| {c['absorbed_bytes'] / 1e6:.1f} MB |"
            )
        lines.append("")
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
        shown = [
            f"{s[0]} [{s[1]}]" if isinstance(s, tuple) else str(s)
            for s in sorted(skipped)
        ]
        lines.append(
            f"_Skipped builders (non-plain setup): {len(shown)} — "
            f"{', '.join(shown[:12])}"
            f"{'…' if len(shown) > 12 else ''}_"
        )
        lines.append("")
    lines.append(
        "_Estimates assume uniform column widths and FK-grain row counts; "
        "they rank candidates, they do not decide — adopt only behind a "
        "measured A/B (BENCH_SCALING discipline)._"
    )
    return "\n".join(lines)
