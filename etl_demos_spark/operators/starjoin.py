"""Star-schema join builder (fact ⟕ dimensions) with broadcast policy.

Reference parity: f_loan_contract joins loans LEFT JOIN 4 dimensions on
natural keys (reference/dbt/models/marts/core/f_loan_contract.sql:36-44);
f_default_event date join (:28-29); f_dealer_performance_daily join+agg
(:23-30).

Scale notes: dimensions are orders of magnitude smaller than facts (the
reference's biggest dim is ~thousands of rows). Broadcasting every dim
turns the whole star join into a single map-side stage: zero shuffle of the
fact table, one pass, fully pipelined in whole-stage codegen. At 100 TB of
fact data that is the difference between a map-only job and five full
shuffles. Dims too large to broadcast (rare) fall back automatically —
pass broadcast=False for that dim and AQE picks sort-merge/shuffled-hash,
or pre-bucket both sides on the key.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# (dim_df, join_on, how, broadcast) — join_on is a column name, list of
# names, or a Column condition.
DimSpec = tuple[DataFrame, object, str, bool]


def star_join(fact: DataFrame, dims: Sequence[DimSpec]) -> DataFrame:
    out = fact
    for dim, on, how, do_broadcast in dims:
        right = F.broadcast(dim) if do_broadcast else dim
        out = out.join(right, on=on, how=how)
    return out


def conditional_sum(cond: Column, value: Column | None = None) -> Column:
    """A3: ``sum(case when cond then v else 0 end)`` pivot-style measure
    (f_dealer_performance_daily.sql:18-19)."""
    v = F.lit(1) if value is None else value
    return F.sum(F.when(cond, v).otherwise(F.lit(0)))


class PrunableDim:
    """A dimension in a wide star view that may be eliminated when unused.

    Join elimination is exact iff the join cannot change fact cardinality:
    ``how='left'`` (never filters) against a dimension UNIQUE on the join
    key (never multiplies). The caller declares uniqueness by constructing
    this spec; ``plans/quality.py:assert_unique`` is the enforcement hook
    for untrusted dims.
    """

    def __init__(self, df: DataFrame, on, how: str = "left", broadcast: bool = True):
        if how != "left":
            raise ValueError("join elimination requires how='left'")
        if not isinstance(on, (str, list, tuple)):
            # a Column condition can't tell us which fact columns the
            # join consumes, so contributed() can't subtract keys —
            # fail HERE with the contract instead of [NOT_ITERABLE]
            # deep inside pruned_star
            raise TypeError(
                "PrunableDim join_on must be a column name or list of "
                f"names (got {type(on).__name__}); arbitrary Column "
                "conditions can't participate in join elimination — "
                "join that dimension unconditionally instead"
            )
        self.df = df
        self.on = on
        self.broadcast = broadcast

    def contributed(self) -> set[str]:
        keys = {self.on} if isinstance(self.on, str) else set(self.on)
        return set(self.df.columns) - keys


def pruned_star(fact: DataFrame, dims: Sequence[PrunableDim], columns: Sequence[str]) -> DataFrame:
    """Wide-view builder with LEFT-JOIN ELIMINATION: join only the
    dimensions that contribute at least one requested column.

    This is the optimizer move the dbt wide-mart pattern needs
    (reference f_loan_contract.sql joins 4 dims into every row; most
    downstream queries read 2-3 columns): a query over the view should
    pay only for the dims it touches. Catalyst does not eliminate
    unused joins on its own (it cannot know dims are unique), so the
    uniqueness contract lives in the spec and the pruning here. At
    100 TB this removes whole broadcast/shuffle stages, not just
    columns; the certified-equivalence test is q_join_elim, whose
    DuckDB oracle computes the UNPRUNED view.
    """
    want = set(columns)
    out = fact
    for d in dims:
        if d.contributed() & want:
            right = F.broadcast(d.df) if d.broadcast else d.df
            out = out.join(right, on=d.on, how="left")
    missing = want - set(out.columns)
    if missing:
        raise ValueError(f"columns not provided by fact or any dim: {sorted(missing)}")
    return out.select(*columns)
