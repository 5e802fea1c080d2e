"""Numeric helpers with exact, engine-portable semantics.

The reference stages all money columns as BigQuery NUMERIC (decimal 38,9)
precisely so aggregates are exact (stg_corebank_loans.sql:19-21). We follow
the same discipline, and it buys a second property: *cross-engine
determinism*. Floating-point SUM is order-dependent (Spark's partial
aggregation order varies with partitioning; DuckDB's with its own
parallelism), so a double SUM can differ in final ulps between engines and
even between runs. Casting to decimal first makes the aggregate exact and
therefore bit-identical everywhere — which is what the DuckDB-oracle
correctness gate hashes.

Conventions used across the engine and its oracle SQL:
- ``dec(c)``: DECIMAL(18,6) term cast. Products of two terms fit
  decimal(37,12) in Spark / decimal(36,12) in DuckDB — both exact.
- ``exact_sum``: SUM over the decimal cast.
- ``exact_avg``: decimal SUM divided by COUNT as double division of exact
  inputs (deterministic: one correctly-rounded double op).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dec(c: Column | str, precision: int = 18, scale: int = 6) -> Column:
    return _col(c).cast(f"decimal({precision},{scale})")


def exact_sum(c: Column | str, precision: int = 18, scale: int = 6) -> Column:
    return F.sum(dec(c, precision, scale))


def exact_avg(c: Column | str, precision: int = 18, scale: int = 6) -> Column:
    """Deterministic average: exact decimal sum → double → ÷ count."""
    col = _col(c)
    return F.sum(dec(col, precision, scale)).cast("double") / F.count(col)
