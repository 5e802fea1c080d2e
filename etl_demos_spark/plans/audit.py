"""Plan audit: programmatic answers to "is this the plan I'd want at
100 TB?".

The four questions that decide whether a DataFrame plan survives a
100× scale-up — how many shuffles, did predicates/projections reach
the scan, which joins broadcast vs shuffle, is the hot path inside
whole-stage codegen — all read directly off the executed plan. This
module exposes them as data so pipelines can ASSERT their plan shape
in CI instead of eyeballing ``explain()`` output (the repo's own
tests/test_physical_plans.py does exactly this; here it is as a public
API).

Heuristic by design: it string-parses the plan Spark prints. That is
stable enough in practice to pin invariants ("no cartesian product",
"≤ 2 exchanges", "filter reached the scan"), and when Spark's format
drifts, the assert fails loudly — the right failure mode for a CI
guard.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["plan_report", "assert_plan"]


def plan_report(df: DataFrame, execute: bool = False) -> dict:
    """Summarize the executed plan of ``df``.

    Under AQE the interesting physical facts (final join strategy,
    whole-stage-codegen fusion, runtime-coalesced exchanges) only exist
    AFTER execution — pass ``execute=True`` to run the query (noop-style
    count) and report the FINAL adaptive plan; the default reports the
    static plan without executing.

    Keys:
      n_exchanges       shuffle boundaries (each is a full materialize +
                        network pass — the unit of cost at scale)
      n_broadcasts      BroadcastExchange count (small-side joins)
      joins             join operator names in the plan, e.g.
                        ['BroadcastHashJoin', 'SortMergeJoin']
      has_cartesian     CartesianProduct / BroadcastNestedLoopJoin present
      n_scans           file scans
      pushed_filters    list of PushedFilters payloads (per scan)
      read_schemas      list of ReadSchema payloads (column pruning proof)
      codegen_spans     WholeStageCodegen block count (wider = more of
                        the plan fused into generated code)
      aqe               AdaptiveSparkPlan present
    """
    if execute:
        # executes THIS DataFrame's QueryExecution (count()/noop writes
        # spawn a different one, which would leave this plan unfinalized)
        df._jdf.queryExecution().executedPlan().execute().count()
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    # a finalized AdaptiveSparkPlan prints "current plan\n== Initial
    # Plan ==\n..." — count operators in the CURRENT plan only
    plan = qe.executedPlan().toString().split("== Initial Plan ==")[0]
    formatted = qe.explainString(mode.fromString("formatted"))
    codegen = qe.explainString(mode.fromString("codegen"))
    joins = sorted(set(re.findall(r"(\w*(?:HashJoin|MergeJoin|NestedLoopJoin|CartesianProduct)\w*)", plan)))
    # count only real shuffle Exchange operators: 'ReusedExchange' and
    # 'BroadcastExchange' both contain the substring, and a reused
    # broadcast would otherwise inflate the shuffle count
    n_exchange_tokens = len(re.findall(r"\bExchange\b", plan))
    n_reused = len(re.findall(r"\bReusedExchange\b", plan))
    return {
        "n_exchanges": n_exchange_tokens,
        "n_reused_exchanges": n_reused,
        "n_broadcasts": plan.count("BroadcastExchange"),
        "joins": joins,
        "has_cartesian": ("CartesianProduct" in plan)
        or ("BroadcastNestedLoopJoin" in plan),
        "n_scans": len(re.findall(r"FileScan|BatchScan", plan)),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", formatted),
        "read_schemas": re.findall(r"ReadSchema: ([^\n]+)", formatted),
        # static AQE plans carry no codegen subtrees yet — prefer the
        # finalized plan's markers, fall back to the codegen explain
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
        or int(
            (re.search(r"Found (\d+) WholeStageCodegen subtrees", codegen) or [0, 0])[1]
        ),
        "aqe": "AdaptiveSparkPlan" in plan,
    }


def assert_plan(
    df: DataFrame,
    max_exchanges: int | None = None,
    no_cartesian: bool = True,
    require_pushed_filter: str | None = None,
    max_scans: int | None = None,
) -> dict:
    """Assert plan-shape invariants; returns the report for chaining.

    Raises AssertionError with the offending report — wire into CI next
    to the correctness tests so a plan regression (lost pushdown, join
    degrading to nested-loop, an extra shuffle) fails the build."""
    rep = plan_report(df)
    if no_cartesian and rep["has_cartesian"]:
        raise AssertionError(f"plan has a cartesian/nested-loop join: {rep}")
    if max_exchanges is not None and rep["n_exchanges"] > max_exchanges:
        raise AssertionError(
            f"{rep['n_exchanges']} exchanges > allowed {max_exchanges}: {rep}"
        )
    if max_scans is not None and rep["n_scans"] > max_scans:
        raise AssertionError(f"{rep['n_scans']} scans > allowed {max_scans}: {rep}")
    if require_pushed_filter is not None and not any(
        require_pushed_filter in p for p in rep["pushed_filters"]
    ):
        raise AssertionError(
            f"no pushed filter matching {require_pushed_filter!r}: "
            f"{rep['pushed_filters']}"
        )
    return rep
