"""Extract structured facts from ``df.explain("formatted")`` output.

These are the per-operator checks SURVEY.md §4 calls for: a projection that
reads extra columns, a filter that didn't reach the parquet scan, or a
small-dim join that shuffles instead of broadcasting are all plan bugs at
scale — caught here as assertions, not by eyeballing explain output.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(s.strip() for s in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    plan = formatted_plan(df)
    out = []
    # greedy to end of line: nested generics (array<float>) contain '>'
    for m in re.finditer(r"ReadSchema: struct<(.*)>\s*$", plan, re.MULTILINE):
        # split on top-level commas only (nested struct<a,b> types would
        # contain commas inside <...>)
        cols, depth, start = [], 0, 0
        body = m.group(1)
        for i, ch in enumerate(body + ","):
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            elif ch == "," and depth == 0:
                item = body[start:i].strip()
                if item:
                    cols.append(item.split(":")[0].strip())
                start = i + 1
        out.append(cols)
    return out


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_shuffle_exchange(df: DataFrame) -> bool:
    # formatted mode prints the operator ("(n) Exchange") and its Arguments
    # ("hashpartitioning(...)") on separate lines
    plan = formatted_plan(df)
    return bool(re.search(r"\(\d+\) Exchange", plan)) and "hashpartitioning" in plan


def has_take_ordered(df: DataFrame) -> bool:
    """True when a sort+limit compiled to TakeOrderedAndProject (no global sort)."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def wholestage_codegen_spans(df: DataFrame, execute: bool = True) -> int:
    """Number of WholeStageCodegen regions (fused operator pipelines).

    Under AQE the codegen annotations (`*(n)` markers) only appear on the
    finalized plan, so by default the DataFrame is executed first.
    """
    if execute:
        df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return len(set(re.findall(r"\*\((\d+)\)", buf.getvalue())))


def partition_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(s.strip() for s in entry.split(","))
    return out


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def broadcast_build_scans(df: DataFrame) -> list[str]:
    """Table names whose parquet scan feeds a BroadcastExchange build side.

    The scale contract: only bounded dimensions (or provably reduced
    derivations) may appear here — a fact-table scan as a hash build side
    is a plan that dies at 100 TB (found live in a dims-first TPC-H Q5:
    the static planner hash-built the 600k-row lineitem scan because the
    file was under the local broadcast threshold)."""
    lines = simple_plan(df).splitlines()
    out: list[str] = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        for la in lines[i + 1 :]:
            if "FileScan parquet" in la or "Scan parquet" in la:
                m = re.search(r"/(\w+)\.parquet", la)
                if m:
                    out.append(m.group(1))
                break
    return out
