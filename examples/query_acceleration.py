#!/usr/bin/env python
"""Runnable example: query acceleration — answering queries without
touching the fact table (or touching less of it).

    python examples/query_acceleration.py [sf_dir]

Three rewrites the engine certifies against oracles elsewhere
(q_matview, q_join_elim), composed the way a BI/serving layer would:

1. materialized-aggregate routing: a monthly query answered from a
   registered DAILY rollup (plans/matview.py) — the scan shrinks from
   fact-size to rollup-size;
2. left-join elimination over a wide star view
   (operators/starjoin.py:pruned_star) — unused unique-keyed dims drop
   out of the plan entirely;
3. clustered-layout row-group pruning (operators/layout.py) — a range
   predicate skips most parquet row groups after a one-time rewrite.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from etl_demos_spark.operators import layout
from etl_demos_spark.operators.starjoin import PrunableDim, pruned_star
from etl_demos_spark.plans.matview import AggregateStore
from etl_demos_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("query-acceleration")
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")

    # 1. Materialized-aggregate routing: register a daily rollup, ask a
    # monthly question — the router answers from the rollup.
    daily = (
        orders.select(
            "o_orderpriority",
            F.date_format("o_orderdate", "yyyyMM").cast("long").alias("month"),
            F.col("o_orderdate").alias("day"),
            F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
        )
        .groupBy("o_orderpriority", "month", "day")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("p").alias("rev"))
    )
    store = AggregateStore()
    store.register(
        "daily_orders", daily, ("o_orderpriority", "month", "day"),
        {"cnt": "count", "rev": "sum"},
    )
    monthly = store.route(("o_orderpriority", "month"), ("cnt", "rev"))
    assert monthly is not None
    n_months = monthly.count()
    print(f"matview routing: monthly result ({n_months} rows) derived from the daily rollup")

    # 2. Join elimination: wide view over lineitem + two dims; the query
    # touches only part columns, so the orders join disappears.
    o_dim = orders.select(F.col("o_orderkey").alias("okey"), "o_orderstatus")
    p_dim = part.select(F.col("p_partkey").alias("pkey"), "p_type")
    fact = lineitem.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey"), "l_quantity"
    )
    wide = pruned_star(
        fact,
        [PrunableDim(o_dim, on="okey"), PrunableDim(p_dim, on="pkey")],
        ["pkey", "l_quantity", "p_type"],
    )
    plan = wide._jdf.queryExecution().executedPlan().toString()
    n_joins = plan.count("Join")
    by_type = wide.groupBy("p_type").agg(F.sum("l_quantity").alias("qty"))
    print(f"join elimination: wide-view query planned with {n_joins} join(s); "
          f"{by_type.count()} part types")
    assert n_joins == 1

    # 3. Layout-driven row-group pruning: cluster orders on price once,
    # then measure how much of the file a narrow band predicate skips.
    with tempfile.TemporaryDirectory() as tmp:
        clustered = str(Path(tmp) / "orders_clustered")
        layout.optimize_layout(orders, clustered, ("o_totalprice",), target_files=8)
        frac = layout.pruning_fraction(clustered, "o_totalprice", 1000.0, 10000.0)
        print(f"layout pruning: clustered scan skips {frac:.0%} of row groups "
              f"for the narrow price band")
    return 0


if __name__ == "__main__":
    sys.exit(main())
