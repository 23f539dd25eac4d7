"""Object/file listing as a DataFrame (operator S7) — metadata only.

Reference: a boto3 ``list_objects_v2`` paginator (PageSize 100) feeds the
sensor and the labeling stage (processing.py:287-301). Spark's binaryFile
source lists implicitly but also READS content; discovery at 100 TB needs
the listing alone — millions of keys, zero bytes of payload.

Spark-first: enumerate via the Hadoop FileSystem API (works for file://,
s3a://, any configured scheme — pagination is the FS client's concern,
mirroring the paginator) and parallelize the resulting key metadata as a
DataFrame. The listing itself is driver-side like every Spark file index;
for key counts beyond driver memory, point ``list_files`` at narrower
prefixes and union — same sharding the reference applies via bag prefixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

LISTING_SCHEMA = "key string, size long, mtime timestamp"


def list_files(
    spark: SparkSession, root: str, glob: str | None = None, recursive: bool = True
) -> DataFrame:
    """(key, size, mtime) for every file under ``root`` — no content I/O.

    ``glob`` filters by filename (fnmatch semantics, like the sensor's
    ``*.bag``); the result feeds discovery.discover_new directly.
    """
    import datetime as dt
    import fnmatch

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(root)
    fs = path.getFileSystem(conf)
    rows = []
    it = fs.listFiles(path, recursive)
    while it.hasNext():
        st = it.next()
        key = st.getPath().toString()
        if glob is not None and not fnmatch.fnmatch(key.rsplit("/", 1)[-1], glob):
            continue
        rows.append(
            (
                key,
                st.getLen(),
                dt.datetime.fromtimestamp(
                    st.getModificationTime() / 1000, dt.timezone.utc
                ).replace(tzinfo=None),
            )
        )
    return spark.createDataFrame(rows, LISTING_SCHEMA)


def read_evolved(spark, paths: list[str], strict_types: bool = True):
    """Read parquet generations whose schemas EVOLVED (columns added or
    dropped between writes) as one DataFrame: per-path reads unioned by
    NAME with missing columns NULL-filled — the append-only lake's answer
    to "the producer added a field last month".

    ``mergeSchema`` alone handles pure additions within one load, but
    silently unions by position-compatible types; the by-name union here
    also covers column REMOVALS and keeps each generation's pruned scan
    (each path is its own FileScan with its own ReadSchema). With
    ``strict_types`` (default) a column whose TYPE changed between
    generations raises instead of silently casting — type changes should
    go through an explicit migration, not a read-time coercion.
    """
    from pyspark.sql import functions as F  # noqa: F401

    if not paths:  # a glob that matched nothing: clear error, not IndexError
        raise ValueError(
            "read_evolved: no generation paths given (empty listing?)"
        )
    dfs = [spark.read.parquet(p) for p in paths]
    if strict_types:
        seen: dict[str, tuple[str, str]] = {}
        for p, df in zip(paths, dfs):
            for c, t in df.dtypes:
                if c in seen and seen[c][1] != t:
                    raise TypeError(
                        f"column {c!r} changed type between generations: "
                        f"{seen[c][1]} at {seen[c][0]} vs {t} at {p} — "
                        "migrate explicitly instead of coercing at read"
                    )
                seen.setdefault(c, (p, t))
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
