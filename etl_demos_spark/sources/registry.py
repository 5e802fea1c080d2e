"""Metadata-driven source registry + auto-adapter.

Reference parity:
- S3: YAML source registry (config/raw_sources.yml:1-22), loaded by
  dags/bank_etl_dag.py:17-30, one load task per entry. Here: the same
  YAML shape drives ``spark.read`` calls; views are registered per source.
- S1/S2: CSV ingest with header + inferred schema + truncate semantics and
  '.'→'_' header sanitization (include/load_raw_to_bq.py:33-78).
- EP3 auto-adapter: sniff a sample, classify the dataset, synonym-map
  columns, emit a staging projection + default not_null assertions
  (include/auto_data_adapter.py:55-172, integrate_new_dataset.py:34-107).
  The reference emits SQL text + YAML edits; here the "generated model"
  is a closure over a cast_project spec — no codegen, same semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from etl_demos_spark.operators.staging import (
    ColumnSpec,
    cast_project,
    map_columns,
    sanitize_headers,
)

# Semantic port of COLUMN_MAPPINGS (auto_data_adapter.py:16-47): standard
# column ← candidate raw spellings, with the staging cast type.
DEFAULT_COLUMN_MAPPINGS: tuple[ColumnSpec, ...] = (
    ("loan_id", "string", ("UniqueID", "SK_ID_CURR", "loan_id", "id")),
    ("customer_id", "string", ("Customer_ID", "SK_ID_CURR", "customer_id")),
    ("loan_amount", "decimal(38,9)", ("disbursed_amount", "AMT_CREDIT", "loan_amount", "amount")),
    ("asset_cost", "decimal(38,9)", ("asset_cost", "AMT_GOODS_PRICE")),
    ("ltv", "decimal(38,9)", ("ltv", "LTV")),
    ("branch_id", "string", ("branch_id", "Branch_ID")),
    ("dealer_id", "string", ("supplier_id", "dealer_id", "Dealer_ID")),
    ("manufacturer_id", "string", ("manufacturer_id",)),
    ("date_of_birth", "string", ("Date_of_Birth", "Date.of.Birth", "DOB", "DAYS_BIRTH", "date_of_birth")),
    ("employment_type", "string", ("Employment_Type", "Employment.Type", "NAME_INCOME_TYPE")),
    ("disbursal_date", "string", ("DisbursalDate", "disbursal_date")),
    ("default_flag", "bigint", ("loan_default", "TARGET", "default", "default_flag")),
)


@dataclass
class Source:
    name: str
    path: str
    fmt: str = "csv"
    options: dict = field(default_factory=dict)
    sanitize: bool = True


@dataclass
class SourceRegistry:
    sources: dict[str, Source] = field(default_factory=dict)

    @classmethod
    def from_yaml(cls, path: str) -> "SourceRegistry":
        """Accepts the reference's raw_sources.yml shape:
        ``raw_sources: [{name, csv_path, ...}, ...]`` (config/
        raw_sources.yml:1-22; ``sources:`` also accepted). Extra keys like
        project/dataset/table are BigQuery-isms and ignored."""
        import yaml

        doc = yaml.safe_load(Path(path).read_text()) or {}
        reg = cls()
        entries = doc.get("raw_sources", doc.get("sources", [])) or []
        for item in entries:
            src_path = item.get("csv_path") or item.get("path")
            if not src_path:
                # fail at LOAD time naming the entry — a Source(path=None)
                # would surface later as an opaque spark.read error that
                # never mentions the YAML
                raise ValueError(
                    f"source entry {item.get('name', item)!r} in {path} has "
                    "no csv_path/path key"
                )
            reg.add(
                Source(
                    name=item["name"],
                    path=src_path,
                    fmt=item.get("format", "csv"),
                    options=dict(item.get("options", {})),
                    sanitize=bool(item.get("sanitize", True)),
                )
            )
        return reg

    def to_yaml(self, path: str) -> None:
        """EP3 persistence: write-back in the reference's raw_sources.yml
        shape, idempotent by source name (integrate_new_dataset.py:113-155).
        Existing entries in the file are preserved verbatim (including keys
        this engine ignores, e.g. project_id); only names not already
        present are appended, so repeated runs converge."""
        import yaml

        p = Path(path)
        doc = yaml.safe_load(p.read_text()) or {} if p.exists() else {}
        if "raw_sources" not in doc and "sources" in doc:
            doc["raw_sources"] = doc.pop("sources")
        entries = doc.setdefault("raw_sources", [])
        existing = {e.get("name") for e in entries}
        for name, s in self.sources.items():
            if name in existing:
                continue
            entry = {"name": name, "table_id": name, "csv_path": s.path}
            if s.fmt != "csv":
                entry["format"] = s.fmt
            # non-default read settings must survive the round-trip — a
            # reloaded pipe-delimited source silently parsing as comma
            # CSV is a one-garbage-column failure with no error
            if s.options:
                entry["options"] = dict(s.options)
            if not s.sanitize:
                entry["sanitize"] = False
            entries.append(entry)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(yaml.dump(doc, default_flow_style=False, sort_keys=False))

    def add(self, source: Source) -> None:
        self.sources[source.name] = source

    def load(self, spark: SparkSession, name: str) -> DataFrame:
        """S1: header + schema inference for CSV; vectorized native readers
        for parquet/json. Overwrite-on-write (WRITE_TRUNCATE) is the sink's
        job: df.write.mode('overwrite')."""
        s = self.sources[name]
        if s.fmt == "csv":
            df = (
                spark.read.option("header", True)
                .option("inferSchema", True)
                .options(**s.options)
                .csv(s.path)
            )
        elif s.fmt == "parquet":
            df = spark.read.options(**s.options).parquet(s.path)
        elif s.fmt == "json":
            df = spark.read.options(**s.options).json(s.path)
        elif s.fmt == "orc":
            df = spark.read.options(**s.options).orc(s.path)
        else:
            raise ValueError(f"unsupported format: {s.fmt}")
        return sanitize_headers(df) if s.sanitize else df

    def load_all(self, spark: SparkSession, register_views: bool = True) -> dict[str, DataFrame]:
        out = {}
        for name in self.sources:
            out[name] = self.load(spark, name)
            if register_views:
                out[name].createOrReplaceTempView(name)
        return out


def detect_dataset_type(columns: list[str]) -> str:
    """Marker-column classification (auto_data_adapter.py:63-68)."""
    cols = set(columns)
    if "SK_ID_CURR" in cols or "TARGET" in cols and "AMT_CREDIT" in cols:
        return "home_credit"
    if "UniqueID" in cols or "disbursed_amount" in cols:
        return "vehicle_loan"
    return "generic"


def auto_adapt(
    df: DataFrame,
    mappings: tuple[ColumnSpec, ...] = DEFAULT_COLUMN_MAPPINGS,
) -> tuple[DataFrame, list[tuple[str, str, tuple[str, ...]]]]:
    """EP3: synonym-map raw columns to the standard staging contract and
    return (staged_df, default_assertions). Assertions mirror the
    auto-generated not_null tests (integrate_new_dataset.py:222-233).

    Date strategy heuristic (auto_data_adapter.py:113-135): a raw column
    whose name contains 'days' holds a day *offset* (Home Credit's
    DAYS_BIRTH = days relative to application, negative) and becomes
    ``date_add(current_date(), n)``; other date-ish strings parse
    null-safely with the reference's '%d-%m-%y' format.
    """
    import pyspark.sql.functions as F

    from etl_demos_spark.functions.bqcompat import safe_parse_date

    spec = map_columns(df.columns, mappings)
    staged = cast_project(df, spec)
    for out_name, (raw, _t) in spec.items():
        if out_name == "date_of_birth":
            if "days" in raw.lower():
                staged = staged.withColumn(
                    out_name,
                    F.date_add(F.current_date(), F.col(out_name).cast("int")),
                )
            else:
                # Java's yy pivot is 2000-2099, but these are BIRTH
                # dates and the reference parses with Python's %y pivot
                # (1969-2068): without the adjustment '01-01-84' lands
                # on 2084-01-01 and every downstream age is off by a
                # century. add_months(-1200) is an exact 100-year shift.
                parsed = safe_parse_date(out_name, "dd-MM-yy")
                staged = staged.withColumn(
                    out_name,
                    F.when(
                        F.year(parsed) >= 2069, F.add_months(parsed, -1200)
                    ).otherwise(parsed),
                )
    key_cols = [c for c in ("loan_id", "customer_id") if c in spec]
    assertions = [("staged", "not_null", tuple(key_cols))] if key_cols else []
    return staged, assertions


def upsert_staging_yaml(
    path: str,
    source_name: str,
    model_name: str,
    key_columns: tuple[str, ...] = ("loan_id", "customer_id"),
) -> None:
    """EP3 persistence: upsert the dbt-shaped staging.yml
    (integrate_new_dataset.py:157-242). Idempotent:

    - ensure a ``raw`` source block exists (never overwriting manually
      tuned keys on an existing block — setdefault semantics),
    - add ``{name: source_name}`` under raw.tables if absent,
    - add a models entry with default not_null tests on the key columns
      if the model is not already configured (existing entries are left
      untouched so hand-edits survive re-integration).
    """
    import yaml

    p = Path(path)
    doc = yaml.safe_load(p.read_text()) or {} if p.exists() else {}
    doc.setdefault("version", 2)
    sources = doc.setdefault("sources", [])
    models = doc.setdefault("models", [])

    raw = next((s for s in sources if s.get("name") == "raw"), None)
    if raw is None:
        raw = {"name": "raw", "tables": []}
        sources.append(raw)
    tables = raw.setdefault("tables", [])
    if source_name not in {t.get("name") for t in tables}:
        tables.append({"name": source_name})

    if model_name not in {m.get("name") for m in models}:
        models.append(
            {
                "name": model_name,
                "columns": [
                    {"name": c, "tests": ["not_null"]} for c in key_columns
                ],
            }
        )

    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(yaml.dump(doc, default_flow_style=False, sort_keys=False))


def staging_assertions_from_yaml(path: str) -> list[tuple[str, str, tuple[str, ...]]]:
    """Read back staging.yml model tests as the engine's assertion tuples
    ``(model, 'not_null', (cols...))`` — the round-trip inverse of
    upsert_staging_yaml, so a persisted contract can be re-armed on a
    fresh session."""
    import yaml

    doc = yaml.safe_load(Path(path).read_text()) or {}
    out: list[tuple[str, str, tuple[str, ...]]] = []
    for model in doc.get("models", []):
        cols = tuple(
            c["name"]
            for c in model.get("columns", [])
            if "not_null" in (c.get("tests") or [])
        )
        if cols:
            out.append((model["name"], "not_null", cols))
    return out


_IDENT_RE = re.compile(r"[^A-Za-z0-9_]")


def safe_identifier(name: str) -> str:
    """BigQuery-compatible identifier sanitization ('.'→'_' and friends)."""
    return _IDENT_RE.sub("_", name)
