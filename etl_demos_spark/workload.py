"""Workload registry: every operator from SURVEY.md §2 as a named query.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI/DuckDB oracle SQL string over the same parquet
tables. The driver compares both results (row count + schema +
order-insensitive value hash), so results must be *bit-identical* across
engines under any sane normalization. Conventions that guarantee that:

- every computed column is aliased IDENTICALLY in both formulations;
- floating-point aggregation is never used directly: raw doubles are cast
  to pinned DECIMAL types per row (all money columns in the testdata carry
  exactly 2 decimals, so the cast is exact in both engines), and every
  arithmetic step is pinned with an explicit CAST so engine-specific
  decimal type promotion can't change scales — sums are therefore exact;
- monetary outputs leave as DOUBLE via ``CAST(exact_decimal AS DOUBLE)``
  with the scaled integer < 2^53, where decimal→double is a single
  correctly-rounded operation in both engines (DuckDB's hugeint→double is
  exact below 2^53; the ÷10^s is then one IEEE op — same as Java's
  BigDecimal.doubleValue). Ties in any scale-down re-round are impossible
  or round away-from-zero in both engines (Spark HALF_UP == DuckDB's
  half-away for the values involved);
- averages divide that exact double by the count — one more deterministic
  IEEE op;
- temporal outputs leave as ISO strings (pandas/arrow conversions of
  DATE differ *between* engines; strings are normalization-proof). The
  session timezone is pinned UTC and testdata timestamps read as
  timestamp_ntz, matching DuckDB's naive timestamps;
- every integer aggregate in the oracle SQL is ``CAST(... AS BIGINT)``:
  DuckDB ``SUM(integer)`` returns HUGEINT, which pandas materializes as
  float64 while Spark returns int64 — the driver's type-sensitive hash
  then sees ``123.0`` vs ``123`` (the round-1 failure mode). Conversely
  no DECIMAL column may reach the output un-cast (Spark decimals land in
  pandas as ``object``/Decimal, DuckDB's as float64) — surface as DOUBLE.
  ``tests/parity.py`` compares pandas dtype kinds to catch both locally.

Reference parity citations are on each query (SURVEY.md §2 operator ids).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from etl_demos_spark.data import load_table
from etl_demos_spark.functions.bqcompat import (
    bq_week,
    date_key,
    safe_parse_date,
    weekend_flag,
)
from etl_demos_spark.operators import staging
from etl_demos_spark.operators.datespine import date_spine
from etl_demos_spark.operators.keys import dedup_first, distinct_dim, surrogate_key
from etl_demos_spark.operators.starjoin import conditional_sum, star_join
from etl_demos_spark.session import configure_runtime

QueryFn = Callable[[SparkSession, str], DataFrame]

# Pinned decimal types (see module docstring). DEC2 holds any testdata
# money value exactly; rates (discount/tax) fit DEC42.
DEC2 = "decimal(12,2)"
DEC42 = "decimal(4,2)"


def money(c: Column | str) -> Column:
    """Exact per-row money term."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC2)


def money_sum(term: Column) -> Column:
    """Exact decimal SUM surfaced as a deterministic DOUBLE.

    No intermediate re-rounding: a scale-down re-round can land on a .xx50
    tie where Spark (HALF_UP) and DuckDB (half-to-even) disagree. The
    direct decimal→double conversion is a single correctly-rounded op in
    both engines as long as the scaled integer stays below 2^53 — true for
    every sum in this workload (scale ≤ 4, magnitudes ≤ ~1e12).

    Oracle spelling: CAST(SUM(term) AS DOUBLE).
    """
    return F.sum(term).cast("double")


def iso_date(c: Column | str) -> Column:
    """DATE/TIMESTAMP → 'yyyy-MM-dd' string (oracle: strftime '%Y-%m-%d')."""
    return F.date_format(F.col(c) if isinstance(c, str) else c, "yyyy-MM-dd")


@dataclass
class WorkloadEntry:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, WorkloadEntry] = {}


def workload(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
            # extra kwargs pass through for queries with a parameterized
            # scale path (e.g. q_lsh_recall's sample_bucket); the driver
            # and the registry only ever use the 2-arg form
            configure_runtime(spark)
            return fn(spark, sf_dir, **kw)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            # a silent overwrite would drop the old query from the suite
            # AND reflow the 50-slot driver window with no error
            raise ValueError(f"duplicate workload registration: {name!r}")
        REGISTRY[name] = WorkloadEntry(name, wrapped, oracle, tags)
        return wrapped

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# §2.2 Projections / filters / predicates
# ---------------------------------------------------------------------------


@workload(
    "q_project_cast",
    oracle="""
    SELECT CAST(l_orderkey AS VARCHAR) AS order_id,
           CAST(l_linenumber AS BIGINT) AS line_number,
           CAST(CAST(l_quantity AS decimal(12,2)) AS DOUBLE) AS qty,
           CAST(CAST(l_extendedprice AS decimal(12,2)) AS DOUBLE) AS extended_price,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
           l_returnflag AS return_flag
    FROM lineitem
    """,
    tags=("P1", "F7", "P7"),
)
def q_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/F7: the staging cast-and-rename contract (stg_corebank_loans.sql:7-70)
    expressed via operators.staging.cast_project — and P7's synonym mapping
    resolves the same spec from candidate raw names (auto_data_adapter.py:70-82).
    """
    li = T(spark, sf_dir, "lineitem")
    mapped = staging.map_columns(
        li.columns,
        [
            ("order_id", "string", ["order_key", "l_orderkey"]),
            ("line_number", "bigint", ["line_no", "l_linenumber"]),
            ("qty", DEC2, ["quantity", "l_quantity"]),
            ("extended_price", DEC2, ["l_extendedprice"]),
            ("ship_date", "date", ["shipped_on", "l_shipdate"]),
            ("return_flag", "string", ["l_returnflag"]),
        ],
    )
    staged = staging.cast_project(li, mapped)
    return staged.select(
        "order_id",
        "line_number",
        F.col("qty").cast("double").alias("qty"),
        F.col("extended_price").cast("double").alias("extended_price"),
        iso_date("ship_date").alias("ship_date"),
        "return_flag",
    )


@workload(
    "q_filter_notnull",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT c_nationkey) AS n_nations
    FROM customer
    WHERE c_acctbal IS NOT NULL AND c_name IS NOT NULL
    """,
    tags=("P2",),
)
def q_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: null-safe key filter (stg_corebank_customers.sql:18)."""
    c = T(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal").isNotNull() & F.col("c_name").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


@workload(
    "q_filter_eq",
    oracle="""
    SELECT COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS decimal(12,2))) AS DOUBLE) AS total_value
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
    tags=("P3",),
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: equality predicate (f_default_event.sql:11 `loan_default = 1`)."""
    o = T(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == "F").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(money("o_totalprice")).alias("total_value"),
    )


@workload(
    "q_case_banding",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal >= 0 AND c_acctbal <= 2999.99 THEN 'low'
                WHEN c_acctbal >= 3000 AND c_acctbal <= 6999.99 THEN 'mid'
                ELSE 'high' END AS balance_band,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS decimal(12,2))) AS DOUBLE) AS total_balance
    FROM customer
    GROUP BY balance_band
    """,
    tags=("P6", "P4", "P5"),
)
def q_case_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: CASE WHEN banding (dim_customer.sql:20-26 age bands) — via
    the staging.banding helper, the one CASE-banding implementation."""
    from etl_demos_spark.operators.staging import banding

    c = T(spark, sf_dir, "customer")
    band = banding(
        "c_acctbal",
        [(None, -0.01, "negative"), (0, 2999.99, "low"), (3000, 6999.99, "mid")],
        "high",
    )
    return (
        c.select(band.alias("balance_band"), "c_acctbal")
        .groupBy("balance_band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(money("c_acctbal")).alias("total_balance"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 / §2.5 Aggregations & windows
# ---------------------------------------------------------------------------


@workload(
    "q_group_agg",
    oracle="""
    SELECT l_returnflag AS return_flag,
           l_linestatus AS line_status,
           COUNT(*) AS count_order,
           CAST(SUM(CAST(l_quantity AS decimal(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS decimal(12,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS decimal(12,2))
                    * CAST(1 - l_discount AS decimal(4,2)) AS decimal(16,4)))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_undiscounted,
           CAST(SUM(CAST(l_quantity AS decimal(12,2))) AS DOUBLE) / COUNT(*)
               AS avg_qty
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A1", "A2", "A3", "A4"),
)
def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4: multi-key hash agg with count/sum/avg and a conditional sum
    (f_dealer_performance_daily.sql:13-31) — TPC-H Q1 shape on the testdata.
    """
    li = T(spark, sf_dir, "lineitem")
    qty = money("l_quantity")
    ep = money("l_extendedprice")
    disc_price = (ep * (F.lit(1) - F.col("l_discount")).cast(DEC42)).cast(
        "decimal(16,4)"
    )
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy(
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
        )
        .agg(
            F.count(F.lit(1)).alias("count_order"),
            money_sum(qty).alias("sum_qty"),
            money_sum(ep).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            conditional_sum(F.col("l_discount") == 0).alias("n_undiscounted"),
            (money_sum(qty) / F.count(F.lit(1))).alias("avg_qty"),
        )
    )


@workload(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment AS mktsegment FROM customer",
    tags=("A5",),
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: DISTINCT dimension seed (dim_product.sql:4-6)."""
    c = T(spark, sf_dir, "customer")
    return distinct_dim(c.withColumnRenamed("c_mktsegment", "mktsegment"), ["mktsegment"])


@workload(
    "q_window_dedup",
    oracle="""
    SELECT o_custkey AS custkey,
           o_orderkey AS first_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS first_orderdate
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
    tags=("W1",),
)
def q_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number dedup keeping first row per key
    (stg_corebank_customers.sql:16,30), with a deterministic tiebreak.
    """
    o = T(spark, sf_dir, "orders")
    return dedup_first(o, ["o_custkey"], ["o_orderdate", "o_orderkey"]).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("first_orderkey"),
        iso_date("o_orderdate").alias("first_orderdate"),
    )


@workload(
    "q_surrogate_key",
    oracle="""
    SELECT mktsegment,
           ROW_NUMBER() OVER (ORDER BY mktsegment) AS segment_key
    FROM (SELECT DISTINCT c_mktsegment AS mktsegment FROM customer)
    """,
    tags=("W2",),
)
def q_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: global row_number surrogate key (dim_customer.sql:32). Exact
    reference semantics — dimension-sized input only; operators.keys.dense_ids
    is the 100 TB path (verified equivalent in tests).
    """
    c = T(spark, sf_dir, "customer")
    dim = distinct_dim(c.withColumnRenamed("c_mktsegment", "mktsegment"), ["mktsegment"])
    return surrogate_key(dim, ["mktsegment"], "segment_key")


# ---------------------------------------------------------------------------
# §2.6 Set ops / generators
# ---------------------------------------------------------------------------

_STATUS_ROWS = [
    (1, "ACTIVE", "Loan is active and payments are current"),
    (2, "CLOSED", "Loan fully repaid"),
    (3, "DEFAULTED", "Loan in default"),
    (4, "RESTRUCTURED", "Loan terms modified"),
]


@workload(
    "q_union_literal",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'ACTIVE', 'Loan is active and payments are current'),
        (CAST(2 AS BIGINT), 'CLOSED', 'Loan fully repaid'),
        (CAST(3 AS BIGINT), 'DEFAULTED', 'Loan in default'),
        (CAST(4 AS BIGINT), 'RESTRUCTURED', 'Loan terms modified')
    ) t(status_key, status_code, status_desc)
    """,
    tags=("O2",),
)
def q_union_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: literal seed table via UNION ALL of VALUES rows
    (dim_contract_status.sql:10-15)."""
    schema = "status_key long, status_code string, status_desc string"
    rows = [spark.createDataFrame([r], schema) for r in _STATUS_ROWS]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@workload(
    "q_date_spine",
    oracle="""
    SELECT CAST(strftime(d, '%Y%m%d') AS BIGINT) AS date_key,
           strftime(d, '%Y-%m-%d') AS full_date,
           CAST(year(d) AS BIGINT) AS year,
           CAST(quarter(d) AS BIGINT) AS quarter,
           CAST(month(d) AS BIGINT) AS month,
           CAST(CASE WHEN datediff('day', date_trunc('year', d), d)
                          < (7 - dayofweek(date_trunc('year', d))) % 7
                     THEN 0
                     ELSE 1 + floor((datediff('day', date_trunc('year', d), d)
                                     - (7 - dayofweek(date_trunc('year', d))) % 7) / 7)
                END AS BIGINT) AS week,
           CAST(dayofweek(d) + 1 AS BIGINT) AS day_of_week,
           dayofweek(d) IN (0, 6) AS is_weekend
    FROM (SELECT unnest(generate_series(DATE '2020-01-01', DATE '2021-12-31',
                                        INTERVAL 1 DAY)) AS d)
    """,
    tags=("O3", "F4", "F5", "F6"),
)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 + F4/F5/F6: generated date spine with calendar parts
    (dim_date.sql:3-16). Week uses BigQuery semantics (Sunday-start, week 0)
    via functions.bqcompat.bq_week; the DuckDB oracle spells out the same
    arithmetic (its dayofweek is 0=Sunday, hence the +1 to match Spark's
    1=Sunday).
    """
    spine = date_spine(spark, "2020-01-01", "2021-12-31")
    d = F.col("d")
    return spine.select(
        date_key(d).alias("date_key"),
        iso_date(d).alias("full_date"),
        F.year(d).cast("long").alias("year"),
        F.quarter(d).cast("long").alias("quarter"),
        F.month(d).cast("long").alias("month"),
        bq_week(d).alias("week"),
        F.dayofweek(d).cast("long").alias("day_of_week"),
        weekend_flag(d).alias("is_weekend"),
    )


# ---------------------------------------------------------------------------
# §2.7 Scalar functions
# ---------------------------------------------------------------------------


@workload(
    "q_safe_parse_date",
    oracle="""
    SELECT o_orderkey AS orderkey,
           strftime(try_strptime(date_str, '%d-%m-%Y'), '%Y-%m-%d') AS parsed_date
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 0 THEN 'not-a-date'
                    ELSE strftime(o_orderdate, '%d-%m-%Y') END AS date_str
        FROM orders
    )
    """,
    tags=("F1",),
)
def q_safe_parse_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: SAFE.PARSE_DATE — NULL (not error) on malformed input
    (stg_corebank_loans.sql:15-16). Every 10th key gets a poisoned string.
    """
    o = T(spark, sf_dir, "orders")
    date_str = F.when(F.col("o_orderkey") % 10 == 0, F.lit("not-a-date")).otherwise(
        F.date_format("o_orderdate", "dd-MM-yyyy")
    )
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        iso_date(safe_parse_date(date_str, "dd-MM-yyyy")).alias("parsed_date"),
    )


@workload(
    "q_date_key",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS order_date_key
    FROM orders
    """,
    tags=("F4",),
)
def q_date_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: format_date('%Y%m%d') cast int64 date key (dim_date.sql:9)."""
    o = T(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        date_key("o_orderdate").alias("order_date_key"),
    )


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------


@workload(
    "q_star_join",
    oracle="""
    SELECT r_name AS region_name,
           n_name AS nation_name,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(CAST(l_extendedprice AS decimal(12,2))
                    * CAST(1 - l_discount AS decimal(4,2)) AS decimal(16,4)))
                AS DOUBLE) AS revenue
    FROM lineitem
    LEFT JOIN orders   ON l_orderkey = o_orderkey
    LEFT JOIN customer ON o_custkey = c_custkey
    LEFT JOIN nation   ON c_nationkey = n_nationkey
    LEFT JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    tags=("J1",),
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: multi-way left star join, fact ⟕ 4 dims (f_loan_contract.sql:36-44).

    Broadcast policy by GROWTH, not current size: nation/region are
    fixed-cardinality dims → always broadcast (hint). orders/customer scale
    WITH the fact data, so they get no hint — AQE picks broadcast while
    they fit (it does at every test sf; measured equal-or-faster than
    forcing it) and degrades to shuffle joins at cluster scale instead of
    OOMing the driver with a 600 GB "broadcast".
    """
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = T(spark, sf_dir, "region")
    joined = star_join(
        li,
        [
            (o, li["l_orderkey"] == o["o_orderkey"], "left", False),
            (c, o["o_custkey"] == c["c_custkey"], "left", False),
            (n, c["c_nationkey"] == n["n_nationkey"], "left", True),
            (r, n["n_regionkey"] == r["r_regionkey"], "left", True),
        ],
    )
    revenue_term = (
        money("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(DEC42)
    ).cast("decimal(16,4)")
    return joined.groupBy(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        money_sum(revenue_term).alias("revenue"),
    )


@workload(
    "q_date_join",
    oracle="""
    SELECT CAST(year(d) AS BIGINT) AS order_year,
           COUNT(o_orderkey) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS decimal(12,2))) AS DOUBLE) AS total_value
    FROM (SELECT unnest(generate_series(DATE '1992-01-01', DATE '1998-12-31',
                                        INTERVAL 1 DAY)) AS d) spine
    LEFT JOIN orders ON CAST(o_orderdate AS DATE) = CAST(d AS DATE)
    GROUP BY order_year
    """,
    tags=("J2",),
)
def q_date_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: fact ⟕ date dimension on date equality (f_default_event.sql:28-29),
    here spine-side to also exercise the generated dimension. The spine is
    tiny → broadcast; the fact side never shuffles before aggregation.
    """
    o = T(spark, sf_dir, "orders")
    spine = date_spine(spark, "1992-01-01", "1998-12-31")
    joined = spine.join(o, o["o_orderdate"].cast("date") == F.col("d"), "left")
    return joined.groupBy(F.year("d").cast("long").alias("order_year")).agg(
        F.count("o_orderkey").alias("n_orders"),
        money_sum(money("o_totalprice")).alias("total_value"),
    )


@workload(
    "q_join_agg",
    oracle="""
    SELECT n_name AS nation_name,
           COUNT(*) AS n_lineitems,
           CAST(SUM(CAST(l_quantity AS decimal(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_returned
    FROM lineitem
    LEFT JOIN supplier ON l_suppkey = s_suppkey
    LEFT JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("J3", "A3"),
)
def q_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: join inside aggregation (f_dealer_performance_daily.sql:23-30)
    with an A3 conditional count."""
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = star_join(
        li,
        [
            (s, li["l_suppkey"] == s["s_suppkey"], "left", True),
            (n, s["s_nationkey"] == n["n_nationkey"], "left", True),
        ],
    )
    return joined.groupBy(F.col("n_name").alias("nation_name")).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        money_sum(money("l_quantity")).alias("sum_qty"),
        conditional_sum(F.col("l_returnflag") == "R").alias("n_returned"),
    )


# The driver full-checks only the FIRST 50 entries of get_queries()
# (row count + schema + value hash vs the DuckDB oracle); later entries
# get no driver signal at all. Far more paired queries are registered
# than window slots (196 registered / 190 paired as of round 10 —
# counts grow; the invariant, asserted in tests, is that every window
# slot holds a hash-checkable query), so ordering is an explicit policy. _LATE names the entries deliberately
# registered past the window — the rows-only queries (no SQL-expressible
# oracle; property/recall-tested instead) and oracle-paired queries whose
# semantics are duplicated by in-window relatives. Newly added operator
# families take window slots over long-stable queries so every NEW op
# gets at least one driver hash-check. ALL paired queries, late ones
# included, remain hash-verified locally by tests/test_oracle_parity.py
# at sf0.001 and (slow marker) sf0.01 — the same compare the driver runs.
_LATE: tuple[str, ...] = (
    # ---- round-11 rotation (executed per _SEAT_PLAN[11], written at
    # r10 — VERDICT r10 rec 1). In-window this round, as the round's
    # FIRST commit: the remaining 25 r07-certified entries (due back by
    # r11 under K=4 — exactly on time) + 16 of the r08-certified block
    # (due r12, seated one round early) + the 3 r08-registered
    # never-certified queries (q_dedup_cdc, q_lsh_recall,
    # q_cdc_removal — first driver hashes) + the 4 r09-registered
    # domain/versioning queries (q_domain_rollup, q_host_mirror,
    # q_doc_versions, q_version_churn — first driver hashes) + the two
    # standing §2 anchors (q_dsir_select, q_bank_mart).
    # 25 + 16 + 3 + 4 + 2 = 50, window-sized.
    #
    # CADENCE POLICY (unchanged, set r07): re-certification period is
    # K=4 rounds. Capacity: 48 rotating slots x K = 192 >= 187
    # rotation-eligible paired (190 paired - 3 retired). The cadence
    # test (tests/test_oracle_parity.py) asserts the overdue check and
    # the feasibility bound mechanically, exempting _RETIRED entries
    # and entries seated in the written _SEAT_PLAN for the staged
    # round (the due block can span more than one window — r08's
    # handoff red — so "planned next-window seat" counts as on time).
    #
    # RETIREMENT POLICY (written r08 per VERDICT r7 rec 7): paired
    # registrations must stay <= 48*K = 192. When a new registration
    # would cross the bound, retire (drop from rotation, KEEP the
    # local pytest oracle) queries whose semantics are a STRICT SUBSET
    # of another paired query that has been driver-certified at least
    # twice. First batch r09: q_dedup_ngram (subsumed by
    # q_dedup_minhash's shingle path, certified r04+r07). Second batch
    # EXECUTED this round (r10): q_count_distinct (certified
    # r01/r02/r06/r09; subsumed by q_distinct r04+r07 + q_group_agg
    # r04+r07) and q_date_arithmetic (certified r03/r06/r09; subsumed
    # by q_age_band + q_date_key, both certified r05+r08). Third batch
    # EXECUTED r11: q_filter_eq (certified r05/r10; strict subset of
    # q_filter_notnull's scan+filter shape and of every certified
    # TPC-H family filter), retired alongside the 3 r11 registrations
    # (q_dedup_video_dhash, q_dedup_video_exact,
    # q_dedup_image_composite; q_dedup_video_e2e and
    # q_dedup_video_incremental joined later in the round). Current
    # headroom: 192 - 191 = 1. Next
    # candidates when headroom is needed: q_date_key (subsumed by
    # q_date_spine + q_extract_parts once both re-certify) or
    # q_union_literal (strict subset of q_union_by_name).
    #
    # Forward schedule (machine-readable: _SEAT_PLAN below):
    #   r12 window: remaining 32 r08-certified + the 4 remaining
    #        r09-registered (q_dedup_cdc_incremental, q_bitext_mine,
    #        q_mixture_plan, q_calibration) + the 7 r10-registered
    #        extension queries (q_dedup_image_dhash,
    #        q_dedup_image_phash, q_dedup_image_incremental,
    #        q_dedup_image_e2e, q_audio_features, q_dedup_audio_fp,
    #        q_video_meta — first driver hashes) + 2 anchors + 5 free
    #        slots.
    #   r13 window: the 46 r09-certified entries (due r13, on time)
    #        + 2 anchors + the 2 r11-registered video-dedup queries
    #        (q_dedup_video_dhash, q_dedup_video_exact — first driver
    #        hashes).
    #   r14 window: the 47 r10-certified entries still in rotation
    #        (q_filter_eq retired r11) + 2 anchors + 1 free.
    #
    # Everything below is annotated with its latest driver-certified
    # round ("r0N"; all remain hash-verified locally every pytest run
    # by tests/test_oracle_parity.py at sf0.001+sf0.01).
    # -- certified r08, the remaining 32 (due back by r12; seat r12):
    "q_embed_centroid",
    "q_chunk_docs",
    "q_chunk_udtf",
    "q_copurchase",
    "q_ab_test",
    "q_seasonal_naive",
    "q_bootstrap_ci",
    "q_anomaly_mad",
    "q_exists_subquery",
    "q_having_subquery",
    "q_dedup_incremental",
    "q_edit_distance",
    "q_gap_fill",
    "q_cohort_retention",
    "q_promo_share",
    "q_forecast_revenue",
    "q_local_volume",
    "q_nation_volume",
    "q_product_profit",
    "q_important_parts",
    "q_priority_class",
    "q_top_supplier",
    "q_disjunctive_rev",
    "q_dominant_suppliers",
    "q_min_cost_supplier",
    "q_grouping_sets",
    "q_regression",
    "q_union_by_name",
    "q_join_elim",
    "q_drift_report",
    "q_event_transitions",
    "q_bit_funcs",
    # -- certified r09 (the r09 window minus the 2 anchors and the 2
    #    entries retired this round; due back by r13 — all seat r13):
    "q_ann_ivf",
    "q_binary_meta",
    "q_cube",
    "q_event_sliding",
    "q_event_tumbling",
    "q_fingerprint",
    "q_hash_split",
    "q_hierarchy",
    "q_hybrid_search",
    "q_image_features",
    "q_interval_merge",
    "q_item_sim",
    "q_json_extract",
    "q_kmeans_assign",
    "q_kmv_distinct",
    "q_kmv_overlap",
    "q_market_share",
    "q_markov_transitions",
    "q_math_funcs",
    "q_matview",
    "q_mixture_sample",
    "q_pandas_udf",
    "q_pii_redact",
    "q_pivot",
    "q_psi_drift",
    "q_quantile_sketch",
    "q_rest_json",
    "q_rolling_anomaly",
    "q_rollup",
    "q_safe_parse_date",
    "q_salted_agg",
    "q_scd2_dim",
    "q_schema_report",
    "q_semantic_dedup",
    "q_semi_anti_join",
    "q_set_ops",
    "q_stats_agg",
    "q_string_funcs",
    "q_text_stats",
    "q_topk",
    "q_trend_ols",
    "q_triangles",
    "q_union_literal",
    "q_url_curation",
    "q_weighted_sample",
    "q_window_analytics",
    # -- certified r10 (the r10 window minus the 2 anchors and the
    #    r11-retired q_filter_eq; due back by r14 — all 47 seat r14
    #    per _SEAT_PLAN):
    "q_ann_cosine",
    "q_ann_lsh",
    "q_argmax",
    "q_array_funcs",
    "q_binning",
    "q_bpe_tokens",
    "q_case_banding",
    "q_cust_distribution",
    "q_date_spine",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_distinct",
    "q_dup_spans",
    "q_event_funnel",
    "q_event_sessions",
    "q_filter_notnull",
    "q_fuzzy_join",
    "q_group_agg",
    "q_grouped_agg_udf",
    "q_hard_negatives",
    "q_idle_accounts",
    "q_join_agg",
    "q_lang_id",
    "q_map_funcs",
    "q_multimodal_decode",
    "q_null_safe_join",
    "q_orc_roundtrip",
    "q_pack_sequences",
    "q_project_cast",
    "q_quantiles",
    "q_range_frame",
    "q_rank_family",
    "q_repetition",
    "q_scalar_subquery",
    "q_sketch_rollup",
    "q_snapshot_diff",
    "q_star_join",
    "q_string_agg",
    "q_supplier_cnt",
    "q_surrogate_key",
    "q_text_quality",
    "q_text_search",
    "q_twap",
    "q_unpivot",
    "q_waiting_supplier",
    "q_window_dedup",
    # -- registered r09, never driver-certified (locally
    #    hash-verified); the incremental-CDC / bitext / mixture /
    #    calibration quartet seats r12 per _SEAT_PLAN:
    "q_dedup_cdc_incremental",
    "q_bitext_mine",
    "q_mixture_plan",
    "q_calibration",
    # -- registered r10, never driver-certified (locally hash-verified;
    #    the perceptual image dedup family (pairs, e2e keep-one,
    #    incremental replay) + the audio/video decode queries — seat at
    #    r12 per _SEAT_PLAN, taking 6 of that window's 12 free slots):
    "q_dedup_image_dhash",
    "q_dedup_image_phash",
    "q_dedup_image_incremental",
    "q_dedup_image_e2e",
    "q_audio_features",
    "q_dedup_audio_fp",
    "q_video_meta",
    # -- registered r11, never driver-certified (locally hash-verified;
    #    the video dedup PAIRS queries — VERDICT r10 rec 6 — seat r13
    #    per _SEAT_PLAN, taking that window's 2 free slots; the
    #    composite image query (rec 5) and the video e2e keep-one seat
    #    r12 with the multimodal family):
    "q_dedup_video_dhash",
    "q_dedup_video_exact",
    "q_dedup_image_composite",
    "q_dedup_video_e2e",
    "q_dedup_video_incremental",
    # -- RETIRED from rotation (kept registered + oracle-paired so
    #    tests/test_oracle_parity.py still hash-verifies them locally;
    #    never reseated in a driver window). q_dedup_ngram r09;
    #    q_count_distinct + q_date_arithmetic r10; q_filter_eq r11
    #    (third batch — certified r10 per plan, strict subset of
    #    q_filter_notnull's scan+filter shape and of every certified
    #    TPC-H family filter; retired alongside the 3 r11
    #    registrations to keep headroom ≥ 3):
    "q_dedup_ngram",
    "q_count_distinct",
    "q_date_arithmetic",
    "q_filter_eq",
    # -- rows-only (no cross-engine oracle; property/reference-pinned):
    "q_approx_distinct",
    "q_bpe_learn",
    "q_kmeans",
    "q_pca_project",
    "q_pq_search",
    "q_train_classifier",
)

# Queries retired from the driver rotation under the retirement policy
# above. They stay in REGISTRY with their oracle (local pytest parity
# still runs them at both scale factors); they just never take another
# driver window slot, and the cadence test exempts them.
_RETIRED: frozenset[str] = frozenset({
    "q_dedup_ngram",
    "q_count_distinct",
    "q_date_arithmetic",
    "q_filter_eq",
})

# Machine-readable forward seating plan: staged round -> names promised
# a window seat in THAT round's first-commit rotation. The cadence test
# treats a query overdue at round N as compliant when _SEAT_PLAN[N]
# seats it — the rotation is always round N's first commit, so the
# certificate lands in CORRECTNESS_r0N on schedule. Keeping the plan in
# code (not prose) is what lets the tree stay green at handoff when the
# driver drops the new artifact after the final commit.
_SEAT_PLAN: dict[int, frozenset[str]] = {
    11: frozenset({
        "q_age_band",
        "q_asof_join",
        "q_attribution",
        "q_bfs_dist",
        "q_bloom_filter",
        "q_cdc_removal",
        "q_corpus_shuffle",
        "q_csv_roundtrip",
        "q_date_join",
        "q_date_key",
        "q_decontaminate",
        "q_dedup_cdc",
        "q_dedup_embedding",
        "q_dedup_text_e2e",
        "q_doc_versions",
        "q_domain_rollup",
        "q_dup_span_removal",
        "q_embed_covariance",
        "q_embed_norms",
        "q_embed_quantize",
        "q_event_response",
        "q_extract_parts",
        "q_feature_scale",
        "q_heavy_hitters",
        "q_hll_distinct",
        "q_host_mirror",
        "q_incremental_merge",
        "q_label_prop",
        "q_linear_score",
        "q_lm_quality",
        "q_lsh_recall",
        "q_neg_sample",
        "q_null_funcs",
        "q_pagerank",
        "q_ppmi",
        "q_profile_table",
        "q_pyds_scan",
        "q_quality_report",
        "q_range_join",
        "q_returned_revenue",
        "q_rollup_cascade",
        "q_stratified_sample",
        "q_tfidf",
        "q_top_terms",
        "q_top_unshipped",
        "q_variant_shred",
        "q_version_churn",
        "q_winnow_fingerprint",
    }),
    12: frozenset({
        "q_dedup_image_dhash",
        "q_dedup_image_phash",
        "q_dedup_image_composite",
        "q_dedup_video_e2e",
        "q_dedup_video_incremental",
        "q_dedup_image_incremental",
        "q_dedup_image_e2e",
        "q_audio_features",
        "q_dedup_audio_fp",
        "q_video_meta",
        "q_ab_test",
        "q_anomaly_mad",
        "q_bit_funcs",
        "q_bitext_mine",
        "q_bootstrap_ci",
        "q_calibration",
        "q_chunk_docs",
        "q_chunk_udtf",
        "q_cohort_retention",
        "q_copurchase",
        "q_dedup_cdc_incremental",
        "q_dedup_incremental",
        "q_disjunctive_rev",
        "q_dominant_suppliers",
        "q_drift_report",
        "q_edit_distance",
        "q_embed_centroid",
        "q_event_transitions",
        "q_exists_subquery",
        "q_forecast_revenue",
        "q_gap_fill",
        "q_grouping_sets",
        "q_having_subquery",
        "q_important_parts",
        "q_join_elim",
        "q_local_volume",
        "q_min_cost_supplier",
        "q_mixture_plan",
        "q_nation_volume",
        "q_priority_class",
        "q_product_profit",
        "q_promo_share",
        "q_regression",
        "q_seasonal_naive",
        "q_top_supplier",
        "q_union_by_name",
    }),
    13: frozenset({
        "q_ann_ivf",
        "q_binary_meta",
        "q_cube",
        "q_event_sliding",
        "q_event_tumbling",
        "q_fingerprint",
        "q_hash_split",
        "q_hierarchy",
        "q_hybrid_search",
        "q_image_features",
        "q_interval_merge",
        "q_item_sim",
        "q_json_extract",
        "q_kmeans_assign",
        "q_kmv_distinct",
        "q_kmv_overlap",
        "q_market_share",
        "q_markov_transitions",
        "q_math_funcs",
        "q_matview",
        "q_mixture_sample",
        "q_pandas_udf",
        "q_pii_redact",
        "q_pivot",
        "q_psi_drift",
        "q_quantile_sketch",
        "q_rest_json",
        "q_rolling_anomaly",
        "q_rollup",
        "q_safe_parse_date",
        "q_salted_agg",
        "q_scd2_dim",
        "q_schema_report",
        "q_semantic_dedup",
        "q_semi_anti_join",
        "q_set_ops",
        "q_stats_agg",
        "q_string_funcs",
        "q_text_stats",
        "q_topk",
        "q_trend_ols",
        "q_triangles",
        "q_union_literal",
        "q_url_curation",
        "q_weighted_sample",
        "q_window_analytics",
        "q_dedup_video_dhash",
        "q_dedup_video_exact",
    }),
    14: frozenset({
        "q_ann_cosine",
        "q_ann_lsh",
        "q_argmax",
        "q_array_funcs",
        "q_binning",
        "q_bpe_tokens",
        "q_case_banding",
        "q_cust_distribution",
        "q_date_spine",
        "q_dedup_exact",
        "q_dedup_minhash",
        "q_dedup_simhash",
        "q_distinct",
        "q_dup_spans",
        "q_event_funnel",
        "q_event_sessions",
        "q_filter_notnull",
        "q_fuzzy_join",
        "q_group_agg",
        "q_grouped_agg_udf",
        "q_hard_negatives",
        "q_idle_accounts",
        "q_join_agg",
        "q_lang_id",
        "q_map_funcs",
        "q_multimodal_decode",
        "q_null_safe_join",
        "q_orc_roundtrip",
        "q_pack_sequences",
        "q_project_cast",
        "q_quantiles",
        "q_range_frame",
        "q_rank_family",
        "q_repetition",
        "q_scalar_subquery",
        "q_sketch_rollup",
        "q_snapshot_diff",
        "q_star_join",
        "q_string_agg",
        "q_supplier_cnt",
        "q_surrogate_key",
        "q_text_quality",
        "q_text_search",
        "q_twap",
        "q_unpivot",
        "q_waiting_supplier",
        "q_window_dedup",
    }),
}


def ordered_names() -> list[str]:
    names = [n for n in REGISTRY if n not in _LATE]
    names += [n for n in _LATE if n in REGISTRY]
    return names


def get_queries() -> dict[str, QueryFn]:
    return {n: REGISTRY[n].fn for n in ordered_names()}


def get_oracles() -> dict[str, str]:
    return {
        n: REGISTRY[n].oracle
        for n in ordered_names()
        if REGISTRY[n].oracle is not None
    }
