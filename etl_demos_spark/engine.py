"""Engine facade — the one-import surface for reference users.

The reference's workflow is: list sources in raw_sources.yml → Airflow
loads them into BigQuery → dbt builds staging/dims/facts → dbt test
(README.md:41-48). The equivalent here is three calls:

    from etl_demos_spark.engine import Engine

    eng = Engine.local()                       # or Engine(existing_spark)
    eng.add_csv("customers", "data/customers.csv")
    eng.add_csv("loan_applications", "data/auto_loan_default.csv")
    eng.add_csv("payments", "data/payments.csv")
    built = eng.run_warehouse("/tmp/wh")       # 13 models + quality gate
    built["f_loan_contract"].show()

plus `eng.sql(...)` over every loaded source and built model, and
`eng.add_source_auto(...)` for the reference's EP3 schema-evolution path
(sniff → synonym-map → staged view + default assertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_demos_spark.plans.bank_pipeline import build_bank_pipeline
from etl_demos_spark.session import configure_runtime, get_spark
from etl_demos_spark.sources.registry import Source, SourceRegistry, auto_adapt


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = configure_runtime(spark)
        self.registry = SourceRegistry()
        self._loaded: dict[str, DataFrame] = {}

    @classmethod
    def local(cls, app_name: str = "etl_demos_spark") -> "Engine":
        return cls(get_spark(app_name))

    # -- sources ----------------------------------------------------------
    def add_csv(self, name: str, path: str, **options) -> DataFrame:
        self.registry.add(Source(name=name, path=path, fmt="csv", options=options))
        return self._load(name)

    def add_parquet(self, name: str, path: str, **options) -> DataFrame:
        self.registry.add(Source(name=name, path=path, fmt="parquet", options=options))
        return self._load(name)

    def add_json(self, name: str, path: str, **options) -> DataFrame:
        self.registry.add(Source(name=name, path=path, fmt="json", options=options))
        return self._load(name)

    def add_sources_yaml(self, path: str) -> dict[str, DataFrame]:
        """raw_sources.yml-compatible registry file (S3)."""
        reg = SourceRegistry.from_yaml(path)
        for name, src in reg.sources.items():
            self.registry.add(src)
            self._load(name)
        return dict(self._loaded)

    def add_source_auto(
        self, name: str, path: str, persist_dir: str | None = None
    ) -> DataFrame:
        """EP3 self-extension: ingest an unknown CSV, synonym-map it onto
        the standard staging contract, register the staged view, and keep
        its generated not_null assertions.

        With ``persist_dir``, the integration also survives a restart
        (integrate_new_dataset.py:113-242): the raw source is appended
        idempotently to ``<dir>/raw_sources.yml`` and the staged model's
        default not_null tests are upserted into ``<dir>/staging.yml``.
        A fresh Engine re-arms via add_sources_yaml + staging.yml."""
        raw = self.add_csv(f"{name}_raw", path)
        staged, assertions = auto_adapt(raw)
        staged.createOrReplaceTempView(name)
        self._loaded[name] = staged
        self._auto_assertions = getattr(self, "_auto_assertions", []) + [
            (name, kind, cols) for (_m, kind, cols) in assertions
        ]
        if persist_dir is not None:
            from pathlib import Path

            from etl_demos_spark.sources.registry import upsert_staging_yaml

            d = Path(persist_dir)
            self.registry.to_yaml(str(d / "raw_sources.yml"))
            key_cols = tuple(
                c for (_m, kind, cols) in assertions if kind == "not_null" for c in cols
            )
            upsert_staging_yaml(
                str(d / "staging.yml"),
                source_name=f"{name}_raw",
                model_name=name,
                key_columns=key_cols or ("loan_id", "customer_id"),
            )
        return staged

    def _load(self, name: str) -> DataFrame:
        df = self.registry.load(self.spark, name)
        df.createOrReplaceTempView(name)
        self._loaded[name] = df
        return df

    # -- query ------------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self._loaded[name]

    # -- warehouse --------------------------------------------------------
    def run_warehouse(self, warehouse_dir: str, check: bool = True) -> dict[str, DataFrame]:
        """Build the full 13-model bank warehouse from the loaded sources
        (requires: customers, loan_applications, payments)."""
        pipeline = build_bank_pipeline(warehouse_dir=warehouse_dir)
        built = pipeline.run(self.spark, self._loaded, check=check)
        for name, df in built.items():
            df.createOrReplaceTempView(name)
            self._loaded[name] = df
        return built
