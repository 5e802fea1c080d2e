"""Staging-layer operators: typed cast/rename projections and the
synonym-driven column adapter.

Reference parity:
- Cast-and-rename contract projection: every staging model casts every
  column explicitly (reference/dbt/models/staging/stg_corebank_loans.sql:7-70,
  stg_payments.sql:3-12). Here: a declarative spec → one ``select``.
- Header sanitization ('.' → '_'): reference/include/load_raw_to_bq.py:10-30,
  reference/scripts/clean_vehicle_loans.py:6-26.
- Synonym-driven mapping (standard column ← candidate raw names):
  reference/include/auto_data_adapter.py:16-47,70-82. The reference emits
  SQL text; we emit a Column projection — same semantics, no codegen.

Scale notes: a projection is a narrow transformation — no shuffle, fully
pipelined inside whole-stage codegen, and column pruning means unreferenced
raw columns never leave the parquet scan.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# (standard_name, spark_type, candidate raw names in priority order) —
# semantic port of COLUMN_MAPPINGS, auto_data_adapter.py:16-47.
ColumnSpec = tuple[str, str, Sequence[str]]


def sanitize_headers(df: DataFrame, char: str = ".", repl: str = "_") -> DataFrame:
    """Rename columns containing forbidden chars (BigQuery disallows '.').

    Raises on a post-rename collision ('a.b' next to 'a_b'): a silent
    duplicate column name fails far from the cause with
    AMBIGUOUS_REFERENCE — and the warehouse target would reject it."""
    renamed = [c.replace(char, repl) for c in df.columns]
    seen: dict[str, str] = {}
    for old, new in zip(df.columns, renamed):
        if new in seen:
            raise ValueError(
                f"header sanitization collision: {old!r} and {seen[new]!r} "
                f"both map to {new!r} — rename one at the source"
            )
        seen[new] = old
    return df.toDF(*renamed)


def cast_project(df: DataFrame, spec: Mapping[str, tuple[str, str]]) -> DataFrame:
    """Apply a staging contract: {out_name: (raw_name, type_ddl)} → select.

    Unknown raw columns raise immediately (the staging layer is the schema
    contract; silent drift is the failure mode the reference guards against
    with per-column casts).
    """
    missing = [raw for raw, _ in spec.values() if raw not in df.columns]
    if missing:
        raise ValueError(f"raw columns missing from input: {missing}")
    return df.select(
        *[F.col(raw).cast(t).alias(out) for out, (raw, t) in spec.items()]
    )


def map_columns(
    raw_columns: Sequence[str], mappings: Sequence[ColumnSpec]
) -> dict[str, tuple[str, str]]:
    """First-match synonym resolution: for each standard column, pick the
    first candidate present in the raw header (auto_data_adapter.py:70-82).
    Returns a cast_project spec for the columns that resolved.
    """
    raw_set = {c.lower(): c for c in raw_columns}
    spec: dict[str, tuple[str, str]] = {}
    for std, type_ddl, candidates in mappings:
        for cand in candidates:
            hit = raw_set.get(cand.lower())
            if hit is not None:
                spec[std] = (hit, type_ddl)
                break
    return spec


def with_literals(df: DataFrame, literals: Mapping[str, object]) -> DataFrame:
    """Constant columns ('RETAIL' as customer_type — stg_corebank_customers
    .sql:15) and typed NULL stubs (f_loan_contract.sql:29-32) in one call:
    a value of (None, type_ddl) produces ``cast(null as T)``.
    """
    out = df
    for name, val in literals.items():
        if isinstance(val, tuple) and val[0] is None:
            out = out.withColumn(name, F.lit(None).cast(val[1]))
        else:
            out = out.withColumn(name, F.lit(val))
    return out


def banding(col: Column | str, cuts: Sequence[tuple], otherwise: str) -> Column:
    """CASE WHEN banding (dim_customer.sql:20-26): cuts are
    (lo_inclusive, hi_inclusive, label) with None as open bound.
    """
    if not cuts:
        raise ValueError("banding requires at least one cut")
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for lo, hi, label in cuts:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (c >= lo)
        if hi is not None:
            cond = cond & (c <= hi)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return expr.otherwise(F.lit(otherwise))
