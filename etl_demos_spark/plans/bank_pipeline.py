"""The reference's bank warehouse — 3 staging + 5 dims + 5 facts — as a
Pipeline model graph (README.md:53-55: "3 inputs → 3 staging views →
5 dimensions + 5 facts").

Inputs are fixture-shaped (FIXTURES.md: customers, loan_applications,
payments). Every model cites the dbt model it mirrors. Dimension keys are
broadcast into facts; only aggregations shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_demos_spark.functions.bqcompat import date_key, year_diff
from etl_demos_spark.operators.datespine import dim_date as build_dim_date
from etl_demos_spark.operators.keys import dedup_first, surrogate_key
from etl_demos_spark.plans.model import Pipeline


def build_bank_pipeline(warehouse_dir: str | None = None) -> Pipeline:
    p = Pipeline(warehouse_dir=warehouse_dir)

    # ---------------- staging (views) ----------------

    @p.model("stg_corebank_loans", sources=("loan_applications",))
    def stg_corebank_loans(spark: SparkSession, loan_applications: DataFrame) -> DataFrame:
        """stg_corebank_loans.sql:7-70 — explicit cast contract. A missing
        dealer column gets the reference's typed-stub treatment
        (f_loan_contract.sql:29-32 pattern): cast(null as string)."""
        la = loan_applications
        dealer = (
            F.col("dealer_id") if "dealer_id" in la.columns else F.lit(None)
        )
        return la.select(
            F.col("loan_id").cast("string").alias("loan_id"),
            F.col("customer_id").cast("string").alias("customer_id"),
            F.col("product_type").cast("string").alias("product_id"),
            dealer.cast("string").alias("dealer_id"),
            F.col("application_date").cast("date").alias("application_date"),
            F.col("loan_amount").cast("decimal(38,9)").alias("loan_amount"),
            F.col("interest_rate").cast("decimal(38,9)").alias("interest_rate"),
            F.col("term_months").cast("long").alias("term_months"),
            F.col("default_flag").cast("long").alias("loan_default"),
        )

    @p.model("stg_corebank_customers", sources=("customers",))
    def stg_corebank_customers(spark: SparkSession, customers: DataFrame) -> DataFrame:
        """stg_corebank_customers.sql — window dedup (rn=1, :16,30),
        'RETAIL' literal (:15), not-null key filter (:18)."""
        c = customers.filter(F.col("customer_id").isNotNull())
        c = dedup_first(c, ["customer_id"])
        return c.select(
            F.col("customer_id").cast("string"),
            F.col("age").cast("long"),
            F.col("gender").cast("string"),
            F.col("region").cast("string"),
            F.col("income").cast("decimal(38,9)"),
            F.col("employment_years").cast("long"),
            F.lit("RETAIL").alias("customer_type"),
        )

    @p.model("stg_payments", sources=("payments",))
    def stg_payments(spark: SparkSession, payments: DataFrame) -> DataFrame:
        """stg_payments.sql:3-12."""
        return payments.select(
            F.col("loan_id").cast("string"),
            F.col("payment_date").cast("date"),
            F.col("amount").cast("decimal(38,9)"),
            F.col("principal_amt").cast("decimal(38,9)"),
            F.col("interest_amt").cast("decimal(38,9)"),
            F.col("fee_amt").cast("decimal(38,9)"),
            F.col("late_fee_amt").cast("decimal(38,9)"),
            F.col("channel_id").cast("long"),
        )

    # ---------------- dimensions (tables) ----------------

    @p.model("dim_customer", refs=("stg_corebank_customers",), materialized="table")
    def dim_customer(spark: SparkSession, stg_corebank_customers: DataFrame) -> DataFrame:
        """dim_customer.sql — age banding (:20-26), surrogate key (:32)."""
        from etl_demos_spark.operators.staging import banding

        c = stg_corebank_customers
        # NULL age falls through every cut (NULL comparisons are never
        # true) into the otherwise branch — same as the hand-written
        # CASE chain this replaces
        band = banding(
            "age",
            [(18, 29, "18-29"), (30, 39, "30-39"), (40, 49, "40-49"),
             (50, None, "50+")],
            "unknown",
        )
        return surrogate_key(
            c.withColumn("age_band", band), ["customer_id"], "customer_key"
        )

    @p.model("dim_product", refs=("stg_corebank_loans",), materialized="table")
    def dim_product(spark: SparkSession, stg_corebank_loans: DataFrame) -> DataFrame:
        """dim_product.sql:4-11 — distinct natural key + row_number."""
        d = stg_corebank_loans.select("product_id").distinct()
        return surrogate_key(d, ["product_id"], "product_key")

    @p.model("dim_dealer", refs=("stg_corebank_loans",), materialized="table")
    def dim_dealer(spark: SparkSession, stg_corebank_loans: DataFrame) -> DataFrame:
        """dim_dealer.sql:4-12."""
        d = stg_corebank_loans.select("dealer_id").distinct()
        return surrogate_key(d, ["dealer_id"], "dealer_key")

    @p.model("dim_date", materialized="table")
    def dim_date(spark: SparkSession) -> DataFrame:
        """dim_date.sql:3-16 — generated 2015..2030 calendar."""
        return build_dim_date(spark, "2015-01-01", "2030-12-31")

    @p.model("dim_contract_status")
    def dim_contract_status(spark: SparkSession) -> DataFrame:
        """dim_contract_status.sql:3-15 — 4-row literal seed with
        PERFORMING/NON_PERFORMING categorization."""
        rows = [
            (1, "ACTIVE", "PERFORMING"),
            (2, "CLOSED", "PERFORMING"),
            (3, "DEFAULTED", "NON_PERFORMING"),
            (4, "WRITTEN_OFF", "NON_PERFORMING"),
        ]
        return spark.createDataFrame(
            rows, "status_key long, status_code string, status_category string"
        )

    # ---------------- facts ----------------

    @p.model(
        "f_loan_contract",
        refs=("stg_corebank_loans", "dim_customer", "dim_product", "dim_dealer", "dim_date"),
        materialized="table",
    )
    def f_loan_contract(
        spark: SparkSession,
        stg_corebank_loans: DataFrame,
        dim_customer: DataFrame,
        dim_product: DataFrame,
        dim_dealer: DataFrame,
        dim_date: DataFrame,
    ) -> DataFrame:
        """f_loan_contract.sql:12-44 — fact ⟕ 4 dims on natural keys,
        surrogate FKs out, typed NULL stubs (:29-32), 'INR' literal (:33).
        All dims broadcast → map-side star join."""
        l = stg_corebank_loans
        out = (
            l.join(
                F.broadcast(dim_customer.select("customer_id", "customer_key")),
                "customer_id",
                "left",
            )
            .join(F.broadcast(dim_product), "product_id", "left")
            .join(F.broadcast(dim_dealer), "dealer_id", "left")
            .join(
                F.broadcast(dim_date.select(F.col("full_date"), F.col("date_key"))),
                l["application_date"] == F.col("full_date"),
                "left",
            )
        )
        return out.select(
            "loan_id",
            "customer_key",
            "product_key",
            "dealer_key",
            F.col("date_key").alias("application_date_key"),
            "loan_amount",
            "interest_rate",
            "term_months",
            "loan_default",
            F.lit(None).cast("decimal(38,9)").alias("processing_fee"),
            F.lit("INR").alias("currency_code"),
        )

    @p.model("f_default_event", refs=("stg_corebank_loans", "dim_date"), materialized="table")
    def f_default_event(
        spark: SparkSession, stg_corebank_loans: DataFrame, dim_date: DataFrame
    ) -> DataFrame:
        """f_default_event.sql:11,28-33 — equality filter on the default
        flag, date join, event surrogate key."""
        d = stg_corebank_loans.filter(F.col("loan_default") == 1)
        joined = d.join(
            F.broadcast(dim_date.select("full_date", "date_key")),
            d["application_date"] == F.col("full_date"),
            "left",
        )
        return surrogate_key(
            joined.select("loan_id", F.col("date_key").alias("event_date_key")),
            ["loan_id"],
            "default_event_key",
        )

    @p.model("f_payment_transaction", refs=("stg_payments",))
    def f_payment_transaction(spark: SparkSession, stg_payments: DataFrame) -> DataFrame:
        """f_payment_transaction.sql:5-6 — date_key derivation + channel
        passthrough; stays a view (recomputed) as in the reference."""
        return stg_payments.select(
            "loan_id",
            date_key("payment_date").alias("payment_date_key"),
            "amount",
            "principal_amt",
            "interest_amt",
            (F.col("fee_amt") + F.col("late_fee_amt")).alias("total_fees"),
            F.col("channel_id").alias("channel_key"),
        )

    @p.model(
        "f_dealer_performance_daily",
        refs=("stg_corebank_loans", "dim_dealer", "dim_date"),
        materialized="table",
    )
    def f_dealer_performance_daily(
        spark: SparkSession,
        stg_corebank_loans: DataFrame,
        dim_dealer: DataFrame,
        dim_date: DataFrame,
    ) -> DataFrame:
        """f_dealer_performance_daily.sql:13-31 — join then GROUP BY
        (dealer_key, date_key) with count/conditional-sum/sum/avg."""
        l = stg_corebank_loans
        joined = l.join(F.broadcast(dim_dealer), "dealer_id", "left").join(
            F.broadcast(dim_date.select("full_date", "date_key")),
            l["application_date"] == F.col("full_date"),
            "left",
        )
        return joined.groupBy("dealer_key", "date_key").agg(
            F.count(F.lit(1)).alias("n_applications"),
            F.sum(F.when(F.col("loan_default") == 0, 1).otherwise(0)).alias("n_good"),
            F.sum(F.when(F.col("loan_default") == 1, 1).otherwise(0)).alias("n_default"),
            F.sum("loan_amount").alias("financed_amount"),
            F.avg("loan_amount").alias("avg_loan_amount"),
        )

    @p.model("f_loan_balance_monthly", refs=("stg_payments", "stg_corebank_loans"))
    def f_loan_balance_monthly(
        spark: SparkSession, stg_payments: DataFrame, stg_corebank_loans: DataFrame
    ) -> DataFrame:
        """f_loan_balance_monthly (view, README.md:55) — monthly principal
        paydown and remaining balance per loan: cumulative window over
        month-grouped payments against the originated amount."""
        monthly = (
            stg_payments.groupBy(
                "loan_id", F.date_trunc("month", "payment_date").cast("date").alias("month")
            )
            .agg(F.sum("principal_amt").alias("principal_paid"))
        )
        w = (
            Window.partitionBy("loan_id")
            .orderBy("month")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = monthly.withColumn("cum_principal", F.sum("principal_paid").over(w))
        return cum.join(
            stg_corebank_loans.select("loan_id", "loan_amount"), "loan_id", "left"
        ).select(
            "loan_id",
            "month",
            "principal_paid",
            (F.col("loan_amount") - F.col("cum_principal")).alias("remaining_balance"),
        )

    # ---------------- declarative quality (staging.yml / marts_core.yml) ----
    p.add_assertion("stg_corebank_loans", "not_null", ["loan_id", "customer_id"])
    p.add_assertion("stg_corebank_loans", "unique", ["loan_id"])
    p.add_assertion("stg_corebank_customers", "not_null", ["customer_id"])
    p.add_assertion("stg_corebank_customers", "unique", ["customer_id"])
    p.add_assertion("stg_payments", "not_null", ["loan_id", "payment_date"])
    p.add_assertion("dim_customer", "unique", ["customer_key"])
    p.add_assertion("dim_customer", "not_null", ["customer_key"])
    p.add_assertion("dim_product", "unique", ["product_key"])
    p.add_assertion("f_loan_contract", "unique", ["loan_id"])
    p.add_assertion("f_loan_contract", "not_null", ["loan_id"])
    return p
