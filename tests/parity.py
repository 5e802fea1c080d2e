"""Oracle-parity comparison mirroring the driver's t2 check, at its
strictest plausible interpretation: row count, column-name set,
order-insensitive exact value equality (columns sorted by name, rows
sorted, numerics normalized to float64 and compared EXACTLY — no
tolerance), AND pandas dtype-kind equality per column. If this passes,
any sane hash scheme the driver uses passes.

The dtype check exists because the driver's value hash is
type/format-sensitive: round 1 had six queries whose values matched but
whose hash failed because DuckDB SUM(integer) returns HUGEINT, which
``.df()`` materializes as float64 while Spark returns int64 (``123.0``
vs ``123``). The rule (recorded in the workload.py oracle conventions):
every integer aggregate in DuckDB oracle SQL must be
``CAST(... AS BIGINT)``.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import pandas as pd


def _norm_cell(v):
    import numpy as np

    if isinstance(v, np.ndarray):
        # DuckDB returns LIST columns as ndarrays; Spark as python lists
        return tuple(_norm_cell(x) for x in v.tolist())
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, (int,)):
        return float(v)
    if isinstance(v, float):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().isoformat()
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def _isnull_scalar(v) -> bool:
    """pd.isna that treats list/array cells (Spark array columns land as
    object cells) as non-null instead of raising on ambiguous truth."""
    if isinstance(v, (list, tuple, dict, set)):
        return False
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):  # ndarray and friends
        return False


def _dtype_kind(series: pd.Series) -> str:
    """Collapse a pandas dtype to the kind the driver's hash is sensitive
    to: integer-ness vs float-ness vs bool vs datetime vs object. A column
    with NO non-null values is unclassifiable (Spark hands back all-None
    object, DuckDB all-NaN float64, for the same data) → neutral sentinel,
    so two all-null columns always match regardless of physical dtype.
    """
    k = series.dtype.kind  # i u f b M O ...
    if len(series) and all(_isnull_scalar(v) for v in series):
        return "∅"
    if k == "u":
        return "i"
    if k == "O":
        vals = [v for v in series if not _isnull_scalar(v)]
        if vals and all(
            isinstance(v, int) and not isinstance(v, bool) for v in vals
        ):
            # DuckDB can hand back HUGEINT as python ints in an object column
            return "i"
    return k


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    du = duck_rel.df()
    if sorted(sp.columns) != sorted(du.columns):
        return False, f"columns differ: spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    if len(sp) != len(du):
        return False, f"row counts differ: spark={len(sp)} duck={len(du)}"
    kind_diffs = [
        (c, sp[c].dtype.kind, du[c].dtype.kind)
        for c in sp.columns
        if _dtype_kind(sp[c]) != _dtype_kind(du[c])
    ]
    if kind_diffs:
        return False, (
            "dtype kinds differ (col, spark, duck): "
            f"{kind_diffs} — integer aggregates in oracle SQL need "
            "CAST(... AS BIGINT)"
        )
    a, b = normalize(sp), normalize(du)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"values differ; first diffs: {diffs}"
    return True, "ok"
