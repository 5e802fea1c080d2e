#!/usr/bin/env python
"""Skewed 10x scale-up (VERDICT r7 rec 5): the uniform tools/make_sf1.py
replication never exercises the skew machinery (operators/skew.py
salting, the AQE skew-join plan pins) under real imbalance. This
variant replicates 10x exactly like make_sf1 and then REMAPS foreign
keys so one hot entity absorbs ~30% of fact rows:

  * lineitem.l_suppkey  -> hot supplier  (replica-0 s_suppkey = 1) for
    a deterministic ~30% of rows — skews the q_star_join supplier join
    and, transitively, its nation-grouped aggregation (one nation now
    holds ~30%+ of all lineitems);
  * orders.o_custkey    -> hot customer  (replica-0 c_custkey = 1) for
    ~30% of rows — skews any customer join/agg (q_join_agg family).

Row selection is xxhash64(pk) % 10 < 3 — deterministic, replay-stable,
independent of replica so the hot share is uniform across the 10x set.
Referential integrity holds: the hot keys are existing replica-0
dimension keys. Dimension tables, documents, embeddings, and events are
byte-identical to the uniform 10x set (skew here targets join/agg keys;
content-keyed operators like MinHash see skew only through duplicate
content, which make_sf1 already covers via exact replica text).

Usage: python tools/make_sf1_skew.py [out_dir]    # default /tmp/sf1skew
Prints one JSON line: per-table rows + measured hot-key shares.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from tools.make_sf1 import FIXED, KEYED, REPLICAS, scale_table  # noqa: E402

HOT_SHARE_PCT = 30
HOT_SUPPKEY = 1
HOT_CUSTKEY = 1


def _skew(df, pk: str, fk: str, hot_key: int):
    hot = F.pmod(F.xxhash64(F.col(pk)), F.lit(100)) < F.lit(HOT_SHARE_PCT)
    return df.withColumn(
        fk, F.when(hot, F.lit(hot_key).cast("long")).otherwise(F.col(fk))
    )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1skew"
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from etl_demos_spark.data import load_table
    from etl_demos_spark.session import get_spark

    spark = get_spark("make-sf1-skew")
    spark.sparkContext.setLogLevel("ERROR")

    counts, shares = {}, {}
    for t in FIXED:
        df = load_table(spark, src, t)
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        counts[t] = df.count()

    for t, (keys, nparts) in KEYED.items():
        df = scale_table(load_table(spark, src, t), keys)
        if t == "embeddings":
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
                        "embedding", lambda x: (x + jitter).cast("float")
                    )
                ),
            )
        df = df.drop("__rep")
        if t == "lineitem":
            df = _skew(df, "l_orderkey", "l_suppkey", HOT_SUPPKEY)
        elif t == "orders":
            df = _skew(df, "o_orderkey", "o_custkey", HOT_CUSTKEY)
        df = df.repartition(nparts)
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        back = spark.read.parquet(f"{out}/{t}.parquet")
        counts[t] = back.count()
        if t == "lineitem":
            shares["lineitem_hot_suppkey"] = round(
                back.filter(F.col("l_suppkey") == HOT_SUPPKEY).count()
                / counts[t],
                4,
            )
        elif t == "orders":
            shares["orders_hot_custkey"] = round(
                back.filter(F.col("o_custkey") == HOT_CUSTKEY).count()
                / counts[t],
                4,
            )

    print(
        json.dumps(
            {"out": out, "replicas": REPLICAS, "rows": counts,
             "hot_shares": shares}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
