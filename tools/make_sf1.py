#!/usr/bin/env python
"""Generate a 10x scale-up of the driver's sf0.1 testdata (VERDICT r6 rec 4).

The floor-accounting table (perf/floor_accounting_r6.json) PREDICTS that
the h2h-tail queries barely move when the data grows 10x, because their
sf0.1 wall time is majority scheduling-floor. This tool manufactures the
data to test that prediction: each fact table is replicated 10x with
per-replica key offsets so referential integrity holds across replicas
(every replica's orders point at that replica's customers, etc.), and
the result lands in /tmp/sf1 with the same file layout the loaders
expect. region/nation stay fixed — they are fixed-size in TPC-H too.

Scale shape choices (all deliberate, all the natural 10x-traffic story):
  * events keep their timestamps — 10x traffic in the SAME time range,
    so per-window row counts grow 10x while window counts stay put;
  * documents keep their text verbatim under fresh doc_ids (corpus grows
    10x; content distribution unchanged);
  * embeddings get a deterministic per-replica jitter (~1e-3) so the 10x
    vector set is not 10 exact copies of each point — ANN candidate
    structure stays realistic.

Replication happens in Spark (explode over a replica array), never on
the driver. Deterministic: no RNG, jitter is xxhash64-derived.

Usage: python tools/make_sf1.py [out_dir]         # default /tmp/sf1
Prints one JSON line with per-table row counts.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

REPLICAS = 10
# One stride for every key family: far above any sf0.1 key (max is
# o_orderkey ~ 600k) and 10 replicas stay far inside int64.
STRIDE = 10_000_000

# table -> (key columns to offset, parquet output partitions)
KEYED = {
    "customer": (["c_custkey"], 4),
    "supplier": (["s_suppkey"], 1),
    "part": (["p_partkey"], 4),
    "orders": (["o_orderkey", "o_custkey"], 8),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], 16),
    "events": (["event_id", "user_id"], 8),
    "documents": (["doc_id"], 4),
    "embeddings": (["vec_id"], 2),
}
FIXED = ("region", "nation")


def scale_table(df, keys: list[str]):
    rep = df.withColumn(
        "__rep", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
    )
    for k in keys:
        rep = rep.withColumn(k, F.col(k) + F.col("__rep").cast("long") * STRIDE)
    return rep


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_demos_spark.session import get_spark
    from etl_demos_spark.data import load_table

    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    counts = {}
    for t in FIXED:
        df = load_table(spark, src, t)
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        counts[t] = df.count()

    for t, (keys, nparts) in KEYED.items():
        df = scale_table(load_table(spark, src, t), keys)
        if t == "embeddings":
            # per-replica jitter so replicas are near- (not exact-)
            # copies; replica 0 stays bit-identical to the source
            jitter = (
                F.pmod(
                    F.xxhash64(F.col("vec_id"), F.col("__rep")), F.lit(2001)
                )
                - 1000
            ) / F.lit(1_000_000.0)
            df = df.withColumn(
                "embedding",
                F.when(F.col("__rep") == 0, F.col("embedding")).otherwise(
                    F.transform(
                        "embedding",
                        lambda x: (x + jitter).cast("float"),
                    )
                ),
            )
        df = df.drop("__rep").repartition(nparts)
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        counts[t] = spark.read.parquet(f"{out}/{t}.parquet").count()

    print(json.dumps({"out": out, "replicas": REPLICAS, "rows": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
