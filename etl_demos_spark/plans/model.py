"""Model registry with ref()-style dependencies and toposort execution.

Semantic port of the reference's dbt model graph (D1/D2:
dags/bank_etl_dag.py:75 `load_tasks >> dbt_run >> dbt_test`; every model's
`{{ ref(...) }}` edge) — but where dbt compiles Jinja-SQL text and ships it
to BigQuery, here a model is a plain Python function taking upstream
DataFrames and returning a DataFrame; the "manifest" is this registry and
the IR is DataFrame lineage (Catalyst sees the WHOLE pipeline, so filters
push across model boundaries — something dbt's materialization walls
prevent).

Materialization (reference `{{ config(materialized=...) }}`,
dbt_project.yml:7): ``view`` keeps the model lazy (temp view; downstream
queries re-derive, Catalyst fuses), ``table`` writes Parquet and re-reads
(pipeline breaker — cuts lineage, caches the result, enables partitioned
layout). Same trade-off the reference makes, exposed per model.
"""

from __future__ import annotations

import graphlib
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

ModelFn = Callable[..., DataFrame]  # (spark, **upstream DataFrames)


@dataclass
class Model:
    name: str
    fn: ModelFn
    refs: tuple[str, ...] = ()
    sources: tuple[str, ...] = ()
    materialized: str = "view"  # view | table
    partition_by: tuple[str, ...] = ()


@dataclass
class Pipeline:
    """A source registry + model graph + assertion set, runnable in
    dependency order."""

    warehouse_dir: str | None = None
    models: dict[str, Model] = field(default_factory=dict)
    assertions: list = field(default_factory=list)

    def model(
        self,
        name: str,
        refs: Sequence[str] = (),
        sources: Sequence[str] = (),
        materialized: str = "view",
        partition_by: Sequence[str] = (),
    ):
        """Decorator: register a model function. ``refs`` name upstream
        models, ``sources`` name raw inputs provided at run()."""

        def deco(fn: ModelFn) -> ModelFn:
            self.models[name] = Model(
                name, fn, tuple(refs), tuple(sources), materialized, tuple(partition_by)
            )
            return fn

        return deco

    def _validate_refs(self) -> None:
        """Fail fast, by name, on refs to unregistered models — without
        this a typo'd ref surfaces as a bare KeyError mid-run (sequential)
        or a bogus 'cycle in model graph' (parallel)."""
        for name, m in self.models.items():
            unknown = [r for r in m.refs if r not in self.models]
            if unknown:
                raise ValueError(
                    f"model {name!r} refs unregistered model(s) {unknown}; "
                    f"registered: {sorted(self.models)}"
                )

    def order(self) -> list[str]:
        self._validate_refs()
        ts = graphlib.TopologicalSorter(
            {name: set(m.refs) for name, m in self.models.items()}
        )
        return list(ts.static_order())

    def levels(self) -> list[list[str]]:
        """Topological levels: models within a level have no dependencies
        on each other and can build concurrently (D5 — the reference runs
        dbt with 4 threads, profiles.yml:10)."""
        self._validate_refs()
        remaining = {name: set(m.refs) for name, m in self.models.items()}
        out: list[list[str]] = []
        done: set[str] = set()
        while remaining:
            ready = sorted(n for n, deps in remaining.items() if deps <= done)
            if not ready:
                raise ValueError("cycle in model graph")
            out.append(ready)
            done.update(ready)
            for n in ready:
                remaining.pop(n)
        return out

    def run(
        self,
        spark: SparkSession,
        sources: dict[str, DataFrame],
        check: bool = True,
        parallelism: int = 1,
    ) -> dict[str, DataFrame]:
        """Build every model in dependency order. Returns name → DataFrame.

        ``table`` models are written to the warehouse dir (partitioned if
        declared) and re-read, so downstream plans start from a fresh scan
        with statistics; ``view`` models stay lazy lineage.

        ``parallelism > 1`` builds each topological level's models
        concurrently (D5): Spark's scheduler interleaves the jobs — only
        ``table`` models actually run work at build time, so this overlaps
        their write jobs exactly like dbt's threads overlap CREATE TABLEs.
        """
        from concurrent.futures import ThreadPoolExecutor

        built: dict[str, DataFrame] = {}

        def build_one(name: str) -> tuple[str, DataFrame]:
            m = self.models[name]
            missing = [s for s in m.sources if s not in sources]
            if missing:
                raise KeyError(f"model {name}: missing sources {missing}")
            kwargs = {s: sources[s] for s in m.sources}
            kwargs.update({r: built[r] for r in m.refs})
            df = m.fn(spark, **kwargs)
            if m.materialized == "table":
                if not self.warehouse_dir:
                    raise ValueError(f"model {name}: table materialization needs warehouse_dir")
                path = f"{self.warehouse_dir}/{name}"
                writer = df.write.mode("overwrite")
                if m.partition_by:
                    writer = writer.partitionBy(*m.partition_by)
                writer.parquet(path)
                df = spark.read.parquet(path)
            return name, df

        if parallelism <= 1:
            for name in self.order():
                built.update([build_one(name)])
        else:
            with ThreadPoolExecutor(max_workers=parallelism) as pool:
                for level in self.levels():
                    built.update(pool.map(build_one, level))
        if check:
            from etl_demos_spark.plans.quality import run_assertions

            failures = run_assertions(built, self.assertions)
            if failures:
                raise AssertionError(f"data-quality failures: {failures}")
        return built

    def add_assertion(
        self, model: str, kind: str, columns: Sequence[str], **params
    ) -> None:
        """dbt-style declarative test (staging.yml:12-28,
        marts_core.yml:3-16). All four dbt schema-test kinds register:
        'not_null', 'unique', 'accepted_values' (pass ``values=[...]``),
        'relationships' (pass ``to=<model name>, field=<col>`` — ``to``
        resolves against the built models at run time). Unknown kinds
        fail HERE, by name, not as a KeyError mid-run after tables were
        already written."""
        from etl_demos_spark.plans.quality import CHECKS

        if kind not in CHECKS:
            raise ValueError(
                f"unknown assertion kind {kind!r}; known: {sorted(CHECKS)}"
            )
        self.assertions.append((model, kind, tuple(columns), params))
