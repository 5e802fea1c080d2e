"""Surrogate keys and dedup — the dimension-building operators.

Reference parity:
- W1 window dedup: ``row_number() over (partition by k order by ...)`` then
  keep rn=1 (stg_corebank_customers.sql:16,30).
- W2 surrogate key: ``row_number() over (order by k)``
  (dim_customer.sql:32, dim_product.sql:11, dim_dealer.sql:12).
- A5 DISTINCT dimension seed (dim_product.sql:4-6, dim_dealer.sql:4-7).

Scale notes: the reference's global-ORDER-BY row_number serializes the
whole table through ONE partition — fine at 2K rows, fatal at 100 TB.
``surrogate_key`` keeps exact reference semantics for dimension-sized
inputs; ``dense_ids`` is the scale path: rank-stable dense ids computed as
(per-partition row_number) + (exclusive prefix sum of partition counts),
all in DataFrame ops — a range-partitioned sort followed by two narrow
passes, never collapsing to one partition.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def dedup_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence = ()
) -> DataFrame:
    """Keep the first row per key (W1). ``order_by`` should be a
    deterministic total order within each key group (ties make the winner
    nondeterministic — same caveat as the reference, which orders by the
    partition key itself).
    """
    w = Window.partitionBy(*keys).orderBy(*(order_by or keys))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def surrogate_key(
    df: DataFrame, order_by: Sequence[str], key_name: str = "key"
) -> DataFrame:
    """Exact reference semantics (W2): 1-based dense key by global order.

    Single-partition by construction — use for dimension-sized tables only;
    at fact scale use ``dense_ids``.
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(key_name, F.row_number().over(w).cast("long"))


def dense_ids(df: DataFrame, order_by: Sequence[str], key_name: str = "key") -> DataFrame:
    """Scalable rank-stable dense ids (1-based), same result as
    ``surrogate_key`` but distributed.

    Plan: repartitionByRange(order_by) → per-partition row_number (narrow
    after the range exchange) → broadcast-join tiny per-partition offsets.
    The only global structure is the range boundaries (sampled by Spark) and
    a partition-count table with #partitions rows.
    """
    ranged = df.repartitionByRange(*order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    in_part = Window.partitionBy("__pid").orderBy(*order_by)
    numbered = ranged.withColumn("__local_rn", F.row_number().over(in_part))
    counts = numbered.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    offsets = counts.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__cnt").over(
                Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("__pid", "__offset")
    return (
        numbered.join(F.broadcast(offsets), "__pid")
        .withColumn(key_name, (F.col("__local_rn") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )


def distinct_dim(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A5: distinct natural-key projection used to seed dimensions."""
    return df.select(*cols).distinct()
