"""Scale-safe surrogate keys: global sequential ids without the
single-reducer trap.

The naive ``row_number() OVER (ORDER BY …)`` puts the ENTIRE table through
one reducer — the classic plan that works at a million rows and dies at a
hundred billion. ``monotonically_increasing_id`` scales but is sparse,
unstable across runs, and carries no order. This operator gives dense,
deterministic, order-respecting ids with no global window:

1. range-partition on the order keys (sampled boundaries — each partition
   owns a contiguous key range, partition index follows key order);
2. ``row_number`` WITHIN each partition (parallel windows);
3. per-partition counts → running offsets (a window over the tiny
   partition-count table, partitions-many rows) broadcast back;
4. ``seq_id = offset + local row_number``.

Total cost: the same range shuffle a global sort needs, but the window
state never concentrates. Sampled boundaries may split duplicate keys
across adjacent partitions — order stays correct, but ties would get
arbitrary relative ids, so the order key must be UNIQUE (enforced by the
caller appending a tiebreaker column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sequential_ids(
    df: DataFrame,
    order_by: list[str],
    id_name: str = "seq_id",
    start: int = 1,
    n_partitions: int | None = None,
) -> DataFrame:
    """Add a dense ``id_name`` column numbering rows ``start, start+1, …``
    in ``order_by`` order. ``order_by`` must be a unique key (append a
    tiebreaker if it isn't — ties across a sampled range boundary would
    otherwise number arbitrarily)."""
    if not order_by:
        raise ValueError("order_by must name at least one column")
    n_parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = df.repartitionByRange(n_parts, *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_by)
    local = parts.withColumn("__rn", F.row_number().over(w_local))

    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).select("__pid", "__off")

    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(
            id_name, (F.col("__off") + F.col("__rn") + F.lit(start - 1))
        )
        .drop("__pid", "__rn", "__off")
    )
