"""PySpark-native analytics engine with the query and data-processing
capabilities of aws-samples/aws-autonomous-driving-data-lake-mwaa-ros-bag-image-extraction-pipeline,
re-expressed Spark-first (DataFrame/SQL/Catalyst/Structured Streaming).

Layout:
    session     SparkSession factory tuned for local[N] test / cluster scale
    schemas     declared StructType registry (topics, labels, frames, manifest)
    functions/  column-level helpers (hashing, text, vectors, time)
    operators/  DataFrame -> DataFrame transforms (the SURVEY §2 surface +
                dedup / similarity / text-analysis extensions)
    sources/    readers (parquet tables, binary frames, bag fixture decoder)
    streaming/  structured-streaming incremental pipeline (file discovery,
                exactly-once manifest semantics)
    plans/      query registry: every supported query as (spark_fn, oracle_sql)
"""

from .session import get_spark  # noqa: F401
