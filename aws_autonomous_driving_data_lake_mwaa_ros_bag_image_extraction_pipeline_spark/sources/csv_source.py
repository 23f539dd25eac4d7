"""CSV ingestion (operator S8) + CSV→Parquet conversion (K1 pairing).

Reference: ``pd.read_csv(c)`` per topic file then ``to_parquet(...,
compression='snappy')`` into a mirrored ``parquet/topic=<t>/`` layout
(engine.py:173-186). Spark-first: header + schema inference on the
``topic=``-partitioned directory tree; the conversion is a single
partitioned write — schema inference replaces the pandas per-file pass, and
the Hive layout gives partition pruning on every downstream read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_topic_csvs(spark: SparkSession, root: str) -> DataFrame:
    """All topic CSVs under a ``topic=<name>/`` tree as one DataFrame.

    Spark discovers ``topic`` as a partition column from the layout; with
    per-topic headers the union schema is the merged column set (absent
    fields null — same behavior as reading heterogeneous topic dumps).
    """
    return (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .option("basePath", root)
        .csv(f"{root}/topic=*")
    )


def read_one_topic_csv(spark: SparkSession, root: str, topic: str) -> DataFrame:
    """One topic's CSV with its own inferred schema (engine.py:186 parity —
    the reference reads each topic file independently)."""
    return (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .csv(f"{root}/topic={topic.lstrip('/')}")
    )


def csvs_to_parquet(
    spark: SparkSession, csv_root: str, parquet_root: str, topics: list[str]
) -> None:
    """CSV landing → snappy parquet, one dir per topic (engine.py:173-186).

    Per-topic writes (not one union write) because each topic has its own
    wide schema — identical to the reference's file-per-topic conversion,
    but each topic's write is a distributed job, not a pandas single-thread.
    """
    for t in topics:
        df = read_one_topic_csv(spark, csv_root, t)
        df.write.mode("overwrite").option("compression", "snappy").parquet(
            f"{parquet_root}/topic={t.lstrip('/')}"
        )
