#!/usr/bin/env python
"""Merge repeated `bench.py --compare` runs into a per-query table.

The benchmark host shows multi-second CPU-steal windows (a VM neighbor
effect, visible in /proc/stat's steal column), so single runs can inflate
either engine's numbers by 3-10x for a minute at a time. Taking the
per-query MINIMUM across N full runs for BOTH engines filters the steal
noise symmetrically — each engine keeps its best honestly-measured time.

Usage: python tools/bench_report.py OUT.md SF_LABEL stderr1.txt [stderr2.txt ...]

Each stderrN.txt is the stderr of one `bench.py --compare` run (the lines
matching `ratio=`). Prints a markdown table and the aggregate.
"""

from __future__ import annotations

import re
import sys

LINE = re.compile(
    r"^(\S+)\s+spark=\s*([0-9.]+)s duckdb=\s*([0-9.]+)s ratio=\s*([0-9.]+|inf)x?(.*)$"
)


def parse(path: str):
    rows = {}
    with open(path) as fh:
        text = fh.read().replace("\r", "\n")
    for line in text.splitlines():
        m = LINE.match(line.strip())
        if m:
            name, s, d, _r, note = m.groups()
            rows[name] = (float(s), float(d), "not comparable" in note)
    return rows


def main() -> None:
    out, label, paths = sys.argv[1], sys.argv[2], sys.argv[3:]
    runs = [parse(p) for p in paths]
    # union across runs, first-seen order: a query missing from run 1 (e.g.
    # an aborted sweep) must still appear, not silently vanish
    names: list[str] = []
    for r in runs:
        for n in r:
            if n not in names:
                names.append(n)
    lines = [
        f"### {label} (per-query min over {len(runs)} full runs, both engines)",
        "",
        "| query | spark s | duckdb s | ratio |",
        "|---|---|---|---|",
    ]
    tot_s = tot_d = 0.0
    for n in names:
        s = min(r[n][0] for r in runs if n in r)
        d = min(r[n][1] for r in runs if n in r)
        noncmp = next(r[n][2] for r in runs if n in r)
        ratio = s / d if d else float("inf")
        mark = " *" if noncmp else ""
        lines.append(f"| {n}{mark} | {s:.3f} | {d:.3f} | {ratio:.2f}x |")
        if not noncmp:
            tot_s += s
            tot_d += d
    agg = f"{tot_s / tot_d:.2f}x" if tot_d else "n/a (no comparable rows)"
    lines.append(
        f"| **aggregate (comparable)** | **{tot_s:.3f}** | **{tot_d:.3f}** "
        f"| **{agg}** |"
    )
    lines.append("")
    lines.append("`*` oracle is an analytic answer check, not equivalent work.")
    table = "\n".join(lines)
    with open(out, "a") as fh:
        fh.write(table + "\n\n")
    print(table)


if __name__ == "__main__":
    main()
