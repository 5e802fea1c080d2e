"""Materialized-aggregate store with query routing — the continuous-
aggregate / summary-table pattern productized.

A warehouse keeps pre-aggregated rollups (daily revenue per dealer,
hourly events per type). Queries that group COARSER than a stored
rollup never need the raw table: sums and counts re-aggregate, and
averages derive as re-aggregated sum / re-aggregated count. That
re-aggregability is the same algebra streaming/windows.rollup_cascade
exploits level-to-level; here it routes ad-hoc queries.

Routing rule: a stored view answers (keys, measures) when the
requested keys are a SUBSET of the view's keys and every requested
measure is derivable from the view's summable columns. Among matches
the view with the fewest keys (closest to the answer, smallest scan)
wins. At 100 TB this is the difference between scanning a
billions-of-rows fact and a thousands-of-rows rollup.

Correctness is oracle-certified: q_matview answers a monthly query
from a registered DAILY rollup while the DuckDB oracle computes the
same numbers from the raw table — the hash match proves the rewrite is
semantics-preserving, not just plausible.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["AggregateStore", "MatView"]


@dataclass
class MatView:
    name: str
    df: DataFrame
    keys: tuple[str, ...]
    # measure column -> kind: 'sum' (re-aggregate with SUM) or 'count'
    summable: dict[str, str] = field(default_factory=dict)


class AggregateStore:
    """Registry of materialized aggregates + the router."""

    def __init__(self):
        self.views: list[MatView] = []
        self.last_routed: str | None = None  # observability: chosen view

    def register(
        self, name: str, df: DataFrame, keys: tuple[str, ...], summable: dict[str, str]
    ) -> MatView:
        for col, kind in summable.items():
            if kind not in ("sum", "count"):
                raise ValueError(f"{col}: kind must be 'sum' or 'count', got {kind}")
        mv = MatView(name, df, tuple(keys), dict(summable))
        self.views.append(mv)
        return mv

    def route(
        self,
        keys: tuple[str, ...],
        measures: tuple[str, ...],
        avgs: dict[str, tuple[str, str]] | None = None,
    ) -> DataFrame | None:
        """Answer groupBy(keys).agg(measures re-aggregated) from the best
        matching view, or None if no view qualifies (caller falls back
        to the raw table).

        ``avgs`` adds derived averages: out_col -> (sum_col, count_col),
        computed as re-aggregated sum / re-aggregated count (exact —
        an average of averages would be WRONG under uneven group sizes,
        which is why only sums and counts are storable)."""
        avgs = avgs or {}
        need = set(measures) | {c for pair in avgs.values() for c in pair}
        candidates = [
            v
            for v in self.views
            if set(keys) <= set(v.keys) and need <= set(v.summable)
        ]
        if not candidates:
            self.last_routed = None
            return None
        best = min(candidates, key=lambda v: len(v.keys))
        self.last_routed = best.name
        aggs = [F.sum(m).alias(m) for m in measures]
        aggs += [
            F.sum(s).alias(f"__s_{out}")
            for out, (s, _) in avgs.items()
        ]
        aggs += [
            F.sum(c).alias(f"__c_{out}")
            for out, (_, c) in avgs.items()
        ]
        out = best.df.groupBy(*keys).agg(*aggs)
        for name in avgs:
            out = out.withColumn(
                name, F.col(f"__s_{name}") / F.col(f"__c_{name}")
            ).drop(f"__s_{name}", f"__c_{name}")
        return out
