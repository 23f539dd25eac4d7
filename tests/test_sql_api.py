"""SQL-surface functions must mirror their DataFrame twins exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.functions import (
    hashing as H,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.functions import (
    sql_api,
)
from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.functions import (
    text as T,
)


def test_sql_functions_match_dataframe_twins(spark):
    names = sql_api.register_sql_functions(spark)
    assert len(names) == len(sql_api._FUNCS)

    df = spark.createDataFrame(
        [(" The quick  brown fox ",), ("the the THE a of",), ("",)], ["s"]
    )
    df.createOrReplaceTempView("__sqlapi_t")
    got = spark.sql(
        """SELECT aads_tokens(s) AS toks, aads_token_count(s) AS tc,
                  aads_normalized(s) AS nm, aads_fingerprint(s) AS fp,
                  aads_stopword_ratio(s) AS sr, aads_hash63(s) AS h,
                  aads_hash_unit(s) AS u
           FROM __sqlapi_t"""
    ).collect()
    want = df.select(
        T.tokens(F.col("s")).alias("toks"),
        T.token_count(F.col("s")).alias("tc"),
        T.normalized(F.col("s")).alias("nm"),
        T.fingerprint(F.col("s")).alias("fp"),
        T.stopword_ratio(F.col("s")).alias("sr"),
        H.md5_long(F.col("s")).alias("h"),
    ).collect()
    for a, b in zip(got, want):
        assert a.toks == b.toks
        assert a.tc == b.tc
        assert a.nm == b.nm
        assert a.fp == b.fp
        assert (a.sr is None) == (b.sr is None)
        if a.sr is not None:
            assert abs(a.sr - b.sr) < 1e-12
        assert a.h == b.h
        assert 0.0 <= a.u < 1.0


def test_sql_functions_idempotent_reregistration(spark):
    sql_api.register_sql_functions(spark)
    sql_api.register_sql_functions(spark)  # CREATE OR REPLACE → no error
    assert spark.sql("SELECT aads_token_count('a b c') AS n").collect()[0].n == 3


def test_sql_functions_compose_in_views(spark):
    """The SQL surface works inside view definitions — the ad-hoc-user path."""
    sql_api.register_sql_functions(spark)
    spark.createDataFrame(
        [(1, "x y x"), (2, "x y x")], ["doc_id", "text"]
    ).createOrReplaceTempView("__sqlapi_docs")
    dups = spark.sql(
        """SELECT aads_fingerprint(text) AS fp, COUNT(*) AS n
           FROM __sqlapi_docs GROUP BY 1 HAVING COUNT(*) > 1"""
    ).collect()
    assert len(dups) == 1 and dups[0].n == 2
