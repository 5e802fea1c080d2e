"""Slowly-changing-dimension (type 2) construction and maintenance.

The reference's warehouse keeps dimensions current-state-only (dbt
staging models overwrite; see dbt/models/staging/*.sql). SCD2 versioning
is the standard extension every production dimension eventually needs —
effective-dated rows with ``valid_from`` / ``valid_to`` / ``is_current``
— so it is provided here as a first-class operator family.

Scale design: building the dimension from a change log is ONE keyed
shuffle (window partitioned by the business key, ordered by event time).
Change detection, interval assignment, and the current-row flag are all
expressions over lag/lead inside that single window — no self-joins, no
driver-side state. At 100 TB the cost is the shuffle of the change log,
which is the information-theoretic floor for per-entity ordering.

Incremental maintenance (``scd2_apply``) unions the new change batch
with the open rows only, re-runs the same window over that (much
smaller) set, and leaves closed history untouched — the MERGE pattern
without rewriting closed partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_build(
    changes: DataFrame,
    key: str,
    ts_col: str,
    attrs: Sequence[str],
    seq_col: str | None = None,
) -> DataFrame:
    """Collapse a change log into type-2 dimension rows.

    ``changes``: one row per observed state (key, ts, attributes...).
    Consecutive rows with identical ``attrs`` merge into one version;
    each version gets ``valid_from`` (its first ts), ``valid_to`` (the
    next version's ts, NULL while open) and ``is_current``. Ties on ts
    are broken by ``seq_col`` (pass the event/order id) so the result is
    deterministic when an entity changes twice in one grain.

    Null-safe change detection: an attribute moving NULL→value or
    value→NULL opens a new version (struct eqNullSafe against lag).
    """
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    state = F.struct(*[F.col(a) for a in attrs])
    changed = ~state.eqNullSafe(F.lag(state).over(w))
    versions = (
        changes.withColumn("__chg", F.coalesce(changed, F.lit(True)))
        .filter(F.col("__chg"))
        .drop("__chg")
    )
    wv = Window.partitionBy(key).orderBy(*order)
    return versions.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(wv).alias("valid_to"),
        F.lead(ts_col).over(wv).isNull().alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    key: str,
    ts_col: str,
    attrs: Sequence[str],
    seq_col: str | None = None,
) -> DataFrame:
    """Incremental SCD2 maintenance: apply a new change batch to an
    existing dimension without touching UNAFFECTED keys.

    Every version (open AND closed) of a key that appears in the batch
    is re-expressed as a change event at its ``valid_from`` and rebuilt
    together with the batch through ``scd2_build``; keys absent from the
    batch pass through untouched. Work is ∝ |versions of affected keys|
    + |batch|, never |history|.

    Rebuilding the affected keys' FULL version set (not just their open
    rows) is what makes late/out-of-order batches correct: a batch event
    predating the open row's ``valid_from`` must split or merge into
    CLOSED history. Rebuilding only {open row} ∪ batch would emit a new
    version overlapping the untouched closed interval — two versions
    covering the same time range, fact fan-out in scd2_lookup, and a
    dimension that disagrees with a full scd2_build over the complete
    log. Because the existing version set is exactly the collapsed
    change log, re-collapsing it with the new events reproduces the
    full-rebuild result for those keys."""
    batch_keys = batch.select(key).distinct()
    untouched = dim.join(batch_keys, key, "left_anti").select(
        key, *attrs, "valid_from", "valid_to", "is_current"
    )
    affected_as_changes = dim.join(batch_keys, key, "left_semi").select(
        F.col(key), *[F.col(a) for a in attrs], F.col("valid_from").alias(ts_col)
    )
    seq_sel = [F.col(seq_col)] if seq_col else []
    batch_changes = batch.select(
        F.col(key), *[F.col(a) for a in attrs], F.col(ts_col), *seq_sel
    )
    if seq_col:
        # Existing versions get a NULL seq: NULLS FIRST ordering puts the
        # pre-existing state ahead of any same-timestamp batch change.
        affected_as_changes = affected_as_changes.withColumn(
            seq_col, F.lit(None).cast(batch.schema[seq_col].dataType)
        )
    rebuilt = scd2_build(
        affected_as_changes.unionByName(batch_changes), key, ts_col, attrs,
        seq_col,
    )
    return untouched.unionByName(rebuilt)


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
) -> DataFrame:
    """Point-in-time dimension lookup: attach to each fact row the
    dimension version valid at its timestamp (valid_from <= ts <
    valid_to). Expressed as the union-and-carry as-of join
    (operators/asof.py) when the dim is large; the plain range-join form
    here is for broadcast-size dimensions — Spark broadcasts ``dim`` and
    the predicate evaluates map-side, no shuffle of ``facts``."""
    d = dim.alias("__d")
    cond = (
        (facts[ts_col] >= F.col("__d.valid_from"))
        & (F.col("__d.valid_to").isNull() | (facts[ts_col] < F.col("__d.valid_to")))
        & (facts[key] == F.col(f"__d.{key}"))
    )
    return facts.join(F.broadcast(d), cond, "left").drop(F.col(f"__d.{key}"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: tuple[str, ...],
    compare_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Change-data-capture between two table snapshots: one row per
    changed key with ``change_type`` in {insert, delete, update}.

    Shape: ONE full outer join on the natural key — both sides shuffle
    once on the same key (co-partitioned by the join), comparison is a
    null-safe struct equality evaluated map-side after the join. Work is
    ∝ |old| + |new|; at scale, snapshots bucketed/clustered on the key
    (operators/layout.py) make this a zero-extra-shuffle merge join.
    Unchanged keys are dropped before anything downstream sees them, so
    the output is ∝ churn, not table size — the input to incremental
    loads (merge_upsert) and SCD2 maintenance (scd2_apply).
    """
    compare_cols = tuple(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in keys]
    )
    o = old.select(
        *keys,
        F.struct(*[F.col(c) for c in compare_cols]).alias("_old_vals"),
        F.lit(True).alias("_in_old"),
    ).alias("__o")
    n = new.select(
        *keys,
        F.struct(*[F.col(c) for c in compare_cols]).alias("_new_vals"),
        F.lit(True).alias("_in_new"),
    ).alias("__n")
    # NULL-SAFE key equality: a plain equi-join never matches NULL=NULL,
    # so an unchanged row with a NULL key component would be reported as
    # a delete AND an insert on every snapshot cycle — phantom churn fed
    # straight into merge_upsert/scd2_apply. <=> keys still plan as an
    # equi sort-merge join (co-partitioned, one shuffle per side).
    cond = None
    for k in keys:
        cur = F.col(f"__o.{k}").eqNullSafe(F.col(f"__n.{k}"))
        cond = cur if cond is None else (cond & cur)
    j = o.join(n, cond, "full")
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(~F.col("_old_vals").eqNullSafe(F.col("_new_vals")), F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__o.{k}"), F.col(f"__n.{k}")).alias(k)
                for k in keys
            ],
            "change_type",
        )
    )
