"""PySpark-native analytics engine with the query and data-processing
capabilities of aws-samples/aws-autonomous-driving-data-lake-mwaa-ros-bag-image-extraction-pipeline,
re-expressed Spark-first (DataFrame/SQL/Catalyst/Structured Streaming).

Layout:
    session     SparkSession factory tuned for local[N] test / cluster scale
    schemas     declared StructType registry (topics, labels, frames, manifest)
    runner      E1 composition: discover → decode → infer → aggregate → sinks
    functions/  column-level helpers (hashing, text, vectors)
    operators/  DataFrame -> DataFrame transforms (the SURVEY §2 surface +
                dedup / similarity / text-analysis / multimodal / skew
                extensions and the binary/stats sinks)
    sources/    readers (parquet tables, binary frames, bag decode via
                mapInPandas AND a Python Data Source, CSV ingest, listing)
    streaming/  structured-streaming incremental pipeline (exactly-once file
                discovery, manifest ledger, watermarked windows, stateful ops)
    plans/      query registry: every supported query as (spark_fn, oracle_sql)
"""

from .session import get_spark  # noqa: F401
