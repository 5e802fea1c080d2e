"""Oracle-parity comparison mirroring the driver's t2 check, at its
strictest plausible interpretation: row count, column-name set, and
order-insensitive exact value equality (columns sorted by name, rows
sorted, numerics normalized to float64 and compared EXACTLY — no
tolerance). If this passes, any sane hash scheme the driver uses passes.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import pandas as pd


def _norm_cell(v):
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


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    du = duck_rel.df()
    if sorted(sp.columns) != sorted(du.columns):
        return False, f"columns differ: spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    if len(sp) != len(du):
        return False, f"row counts differ: spark={len(sp)} duck={len(du)}"
    a, b = normalize(sp), normalize(du)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"values differ; first diffs: {diffs}"
    return True, "ok"
