"""Every workload query vs its DuckDB oracle — the driver's t2 gate,
run at sf0.001 (fast, per-test) and sf0.01 (the driver's actual scale).
"""

from __future__ import annotations

import pytest

import etl_demos_spark.workload_ext  # noqa: F401  (populates REGISTRY)
from etl_demos_spark.workload import REGISTRY
from tests.conftest import SF_DIR, SF_DIR_MED
from tests.parity import compare

ORACLE_QUERIES = sorted(n for n, e in REGISTRY.items() if e.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, e in REGISTRY.items() if e.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_parity_small(spark, duck, name):
    e = REGISTRY[name]
    ok, msg = compare(e.fn(spark, SF_DIR), duck.sql(e.oracle))
    assert ok, f"{name}: {msg}"


@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_parity_medium(spark, duck_med, name):
    e = REGISTRY[name]
    ok, msg = compare(e.fn(spark, SF_DIR_MED), duck_med.sql(e.oracle))
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    """Queries without SQL-expressible oracles must still run and return a
    stable schema (the driver's weaker rows-only check)."""
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    assert df.count() > 0
    assert set(ent.oracle_sql()) <= set(ent.queries())


def test_driver_window_slots_all_carry_oracles():
    """The explicit registration policy (workload.py _LATE): every one
    of the driver's 50 check-window slots must hold an oracle-paired
    query, and _LATE must only name registered queries."""
    from etl_demos_spark.workload import _LATE, ordered_names

    names = ordered_names()
    assert len(names) >= 50
    rows_only = {n for n, e in REGISTRY.items() if e.oracle is None}
    window = names[:50]
    assert not (set(window) & rows_only), set(window) & rows_only
    assert set(_LATE) <= set(REGISTRY), set(_LATE) - set(REGISTRY)


def test_recertification_cadence():
    """The rotation policy (workload.py _LATE) promises every paired
    query re-enters the driver's 50-slot window within CADENCE_ROUNDS
    of its last certificate. Enforce it MECHANICALLY from the driver's
    own artifacts: scan CORRECTNESS_r0N.json for each query's last
    all-true round; any certified query due at (or before) the round
    being staged must be IN the upcoming window (the staged round =
    latest artifact + 1). Never-certified queries are the backlog
    queue, outside this invariant.

    CADENCE_ROUNDS=4, not 3, for capacity reasons (workload.py _LATE
    header): N paired queries re-seated every K rounds through a
    50-slot window requires N ≤ 50·K. With 172 paired, K=3 caps at
    150 — permanently unsatisfiable once the backlog certifies. The
    feasibility bound is asserted below so registry growth past
    capacity fails loudly instead of silting up the schedule.

    Two exemptions (both machine-readable in workload.py, added r09
    after the structural red-at-handoff of r06/r08 — a due block can
    span more than one 50-slot window, and the driver drops the new
    CORRECTNESS artifact AFTER the round's last commit, so "overdue
    and not yet in the window" can be unavoidable at handoff):
      * _RETIRED queries left the rotation by policy (local pytest
        parity still covers them) — never overdue.
      * A query seated in the written _SEAT_PLAN for the staged round
        is on time: the rotation is always that round's FIRST commit,
        so its certificate lands in that round's artifact. The plan
        itself is asserted feasible (fits the rotating window) and
        composed only of registered names."""
    import glob
    import json
    import re

    from etl_demos_spark.workload import _RETIRED, _SEAT_PLAN, ordered_names

    CADENCE_ROUNDS = 4
    WINDOW = 50
    paired = [
        n for n, e in REGISTRY.items() if e.oracle is not None and n not in _RETIRED
    ]
    # 2 window slots are pinned to the §2 anchors every round
    # (q_dsir_select/q_bank_mart), so rotation capacity is 48·K.
    assert len(paired) <= (WINDOW - 2) * CADENCE_ROUNDS, (
        f"{len(paired)} paired queries exceed rotation capacity "
        f"{(WINDOW - 2) * CADENCE_ROUNDS} at K={CADENCE_ROUNDS}; raise "
        "the cadence or retire queries BEFORE the schedule deadlocks"
    )

    last_cert: dict[str, int] = {}
    rounds = []
    for path in glob.glob("CORRECTNESS_r*.json"):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        rounds.append(rnd)
        for name, res in json.load(open(path)).items():
            if res.get("rows_match") and res.get("schema_match") and res.get("hash_match"):
                last_cert[name] = max(last_cert.get(name, 0), rnd)
    assert rounds, "no CORRECTNESS artifacts found (run from repo root)"
    current = max(rounds) + 1

    # The seat plan must itself be sane: registered names only, and no
    # round promises more seats than the rotating window holds.
    for rnd, seats in _SEAT_PLAN.items():
        assert seats <= set(REGISTRY), (rnd, seats - set(REGISTRY))
        assert len(seats) <= WINDOW - 2, (rnd, len(seats))
    assert _RETIRED <= set(REGISTRY), _RETIRED - set(REGISTRY)

    window = set(ordered_names()[:WINDOW])
    planned = _SEAT_PLAN.get(current, frozenset())
    overdue = {
        n: r
        for n, r in last_cert.items()
        if r <= current - CADENCE_ROUNDS
        and n in REGISTRY
        and n not in window
        and n not in planned
        and n not in _RETIRED
    }
    assert not overdue, (
        f"certified queries overdue for window rotation at r{current:02d} "
        f"(not in window, not seated by _SEAT_PLAN[{current}]): {overdue}"
    )


def test_window_schemas_are_driver_canonicalizable(spark):
    """The driver canonicalizes results by sorting RAW pandas cells —
    a top-level Array/Map/Struct column crashes its canon with
    `unhashable type: numpy.ndarray` (exactly how q_image_features
    burned its first driver slot in r05 while the more forgiving local
    mirror, tests/parity.py, tuple-normalized and stayed green). This
    lint closes that divergence: every in-window query's result schema
    must be scalar-only at the top level. Out-of-window queries may
    return arrays (the local mirror handles them), so only the 50
    window slots are asserted."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from etl_demos_spark.workload import ordered_names

    offenders = {}
    for name in ordered_names()[:50]:
        df = REGISTRY[name].fn(spark, SF_DIR)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-scalar top-level columns in window slots: {offenders}"
