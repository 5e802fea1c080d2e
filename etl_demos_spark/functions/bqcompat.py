"""BigQuery-compatible scalar expression helpers.

The reference's staging/mart SQL leans on a handful of BigQuery functions
whose Spark equivalents have subtly different semantics. Each helper below
documents the delta and implements the *reference's* semantics with Spark
built-ins (JVM-side, codegen-friendly — no Python UDFs).

Reference evidence (cited per function):
- SAFE.PARSE_DATE: reference/dbt/models/staging/stg_corebank_loans.sql:15-16
- date_diff(..., year): reference/dbt/models/marts/core/dim_customer.sql:22-24
- format_date('%Y%m%d'): reference/dbt/models/marts/core/dim_date.sql:9
- extract(week): reference/dbt/models/marts/core/dim_date.sql:14
- weekend flag: reference/dbt/models/marts/core/dim_date.sql:16
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def safe_parse_date(c: Column | str, fmt: str = "dd-MM-yy") -> Column:
    """BigQuery ``SAFE.PARSE_DATE(format, x)`` — NULL on unparseable input.

    Uses ``try_to_date`` so the semantics hold regardless of
    ``spark.sql.ansi.enabled`` (Spark 4 defaults ANSI on, where plain
    ``to_date`` raises). Two-digit-year caveat: Java time pivots ``yy`` at
    2000-2099 while BigQuery ``%y`` pivots 1969-2068; callers parsing
    birth-dates should use 4-digit formats or post-adjust.
    """
    return F.try_to_date(_col(c).cast("string"), fmt)


def date_key(c: Column | str) -> Column:
    """``cast(format_date('%Y%m%d', d) as int64)`` → yyyyMMdd bigint."""
    return F.date_format(_col(c), "yyyyMMdd").cast("long")


def year_diff(end: Column | str, start: Column | str) -> Column:
    """BigQuery ``date_diff(end, start, year)``.

    BigQuery counts *calendar-year boundary crossings*, i.e.
    ``year(end) - year(start)`` — NOT age in whole years. (Spark's
    ``months_between/12`` or datediff-based ages differ around birthdays.)
    """
    return (F.year(_col(end)) - F.year(_col(start))).cast("long")


def bq_week(c: Column | str) -> Column:
    """BigQuery ``extract(week from d)``: weeks begin on Sunday, week 0 is
    the partial week before the first Sunday of the year, range 0..53.

    Spark's ``weekofyear`` is ISO-8601 (Monday start, 1..53, year-crossing)
    — different function entirely. Implemented from first principles:
    week 1 starts at the first Sunday of the year; days before it are
    week 0 (empty when Jan 1 itself is a Sunday).
    """
    d = _col(c)
    jan1 = F.trunc(d, "year")
    doy0 = F.datediff(d, jan1)
    # days before the first Sunday: (7 - dow0(jan1)) % 7, dow0: 0=Sunday.
    dbfs = (F.lit(7) - (F.dayofweek(jan1) - F.lit(1))) % F.lit(7)
    return (
        F.when(doy0 < dbfs, F.lit(0))
        .otherwise(F.lit(1) + F.floor((doy0 - dbfs) / F.lit(7)))
        .cast("long")
    )


def weekend_flag(c: Column | str) -> Column:
    """``extract(dayofweek from d) in (1, 7)`` — Sunday/Saturday.

    Both BigQuery and Spark use 1=Sunday..7=Saturday, so this maps directly.
    """
    return F.dayofweek(_col(c)).isin(1, 7)


def age_band(
    age: Column | str,
    bands: tuple[tuple[int, int, str], ...] = (
        (18, 29, "18-29"),
        (30, 39, "30-39"),
        (40, 49, "40-49"),
    ),
    top_label: str = "50+",
    top_from: int = 50,
    unknown_label: str = "unknown",
) -> Column:
    """CASE-WHEN banding as in dim_customer.sql:20-26 (age buckets)."""
    a = _col(age)
    expr = F.when(a.isNull(), F.lit(unknown_label))
    for lo, hi, label in bands:
        expr = expr.when((a >= lo) & (a <= hi), F.lit(label))
    return expr.when(a >= top_from, F.lit(top_label)).otherwise(F.lit(unknown_label))
