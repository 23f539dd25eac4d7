"""Local replica of the driver's correctness gate.

Runs every registered query via Spark and its DuckDB oracle at sf0.01,
compares row count, sorted-by-name schema, and an order-insensitive
value hash (rows rendered to canonical strings, sorted, md5'd).

Usage: python tools/check_correctness.py [--json OUT.json] [name ...]

--json writes a driver-shaped artifact ({name: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}}) covering EVERY checked query —
the per-round full-registry hard signal (the driver's own file caps at its
first-50 window).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = __import__("os").environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    """UNAMBIGUOUS canonical rendering — the gate's hash is only as good
    as this encoding, so every token is self-delimiting:

    - strings are length-prefixed ("3:a|b" can never collide with two
      fields "a" and "b" across the unescaped "|" join);
    - SQL NULL is a reserved token distinct from any length-prefixed
      string (the literal string "NULL" renders "4:NULL");
    - ±inf handled before the int-collapse check (int(inf) raised
      OverflowError and killed the whole gate run mid-loop);
    - tz-aware timestamps normalize to UTC before dropping tzinfo
      (replace() alone collapsed distinct instants on non-UTC hosts).
    """
    if v is None:
        return "␀"  # ␀ — reserved NULL token (strings are prefixed)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        # "," between self-delimiting tokens: ["a,b"] → "[3:a,b]" vs
        # ["a","b"] → "[1:a,1:b]", and [1,23] vs [12,3] differ too
        return "[" + ",".join(canon(x) for x in v) + "]"
    s = str(v)
    return f"{len(s)}:{s}"


def table_digest(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest(), len(rows)


def _rec(
    rows_match=False,
    schema_match=False,
    hash_match=False,
    spark_rows=None,
    oracle_rows=None,
    err=None,
    rows_only=False,
):
    r = {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
        "spark_rows": spark_rows,
        "oracle_rows": oracle_rows,
        "err": err,
    }
    if rows_only:
        r["rows_only"] = True
    return r


def main() -> None:
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.plans import registry
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = set(argv)
    results = {}
    records = {}
    for name, spec in registry.QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = spec.fn(spark, SF_DIR)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            results[name] = f"SPARK-ERR {type(e).__name__}: {str(e)[:200]}"
            records[name] = _rec(err=results[name])
            continue
        if spec.oracle is None:
            results[name] = f"rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)"
            records[name] = _rec(spark_rows=len(s_rows), rows_only=True)
            continue
        try:
            rel = con.sql(spec.oracle)
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE-ERR {type(e).__name__}: {str(e)[:200]}"
            records[name] = _rec(spark_rows=len(s_rows), err=results[name])
            continue
        try:  # a digest crash must fail THIS query, not abort the gate
            s_hash, s_n = table_digest(s_cols, s_rows)
            d_hash, d_n = table_digest(d_cols, d_rows)
        except Exception as e:  # noqa: BLE001
            results[name] = f"DIGEST-ERR {type(e).__name__}: {str(e)[:200]}"
            records[name] = _rec(spark_rows=len(s_rows), err=results[name])
            continue
        records[name] = _rec(
            rows_match=s_n == d_n,
            schema_match=sorted(s_cols) == sorted(d_cols),
            hash_match=s_hash == d_hash,
            spark_rows=s_n,
            oracle_rows=d_n,
        )
        if sorted(s_cols) != sorted(d_cols):
            results[name] = f"SCHEMA-MISMATCH spark={sorted(s_cols)} duck={sorted(d_cols)}"
        elif s_n != d_n:
            results[name] = f"ROWCOUNT-MISMATCH spark={s_n} duck={d_n}"
        elif s_hash != d_hash:
            order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            sl = sorted("|".join(canon(r[i]) for i in order) for r in s_rows)
            dorder = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            dl = sorted("|".join(canon(r[i]) for i in dorder) for r in d_rows)
            diffs = [(a, b) for a, b in zip(sl, dl) if a != b][:3]
            results[name] = f"HASH-MISMATCH ({s_n} rows) e.g. {diffs}"
        else:
            results[name] = f"PASS ({s_n} rows, {time.time()-t0:.1f}s)"

    width = max(len(n) for n in results)
    npass = sum(1 for v in results.values() if v.startswith("PASS"))
    for name, v in results.items():
        print(f"{name:<{width}}  {v}")
    print(f"\n{npass} PASS / {len(results)} checked")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(records, f, indent=1)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
