"""Source registry, CSV round-trip, header sanitization, auto-adapter."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_demos_spark.operators.staging import sanitize_headers
from etl_demos_spark.operators import multimodal
from etl_demos_spark.sources.registry import (
    Source,
    SourceRegistry,
    auto_adapt,
    detect_dataset_type,
    safe_identifier,
)


def test_csv_roundtrip_with_dotted_headers(spark, tmp_path):
    csv = tmp_path / "vehicle.csv"
    csv.write_text(
        "UniqueID,disbursed_amount,PERFORM_CNS.SCORE,Date.of.Birth\n"
        "1,1000.5,700,01-01-84\n"
        "2,2000.0,650,15-06-90\n"
    )
    reg = SourceRegistry()
    reg.add(Source(name="vehicle_loans", path=str(csv)))
    df = reg.load(spark, "vehicle_loans")
    assert df.columns == ["UniqueID", "disbursed_amount", "PERFORM_CNS_SCORE", "Date_of_Birth"]
    assert df.count() == 2
    assert dict(df.dtypes)["disbursed_amount"] == "double"  # inferSchema


def test_registry_from_yaml(spark, tmp_path):
    csv = tmp_path / "c.csv"
    csv.write_text("a,b\n1,x\n")
    yml = tmp_path / "raw_sources.yml"
    yml.write_text(
        "sources:\n"
        f"  - name: customers\n    project: ignored\n    dataset: ignored\n"
        f"    table: ignored\n    csv_path: {csv}\n"
    )
    reg = SourceRegistry.from_yaml(str(yml))
    out = reg.load_all(spark)
    assert out["customers"].count() == 1
    assert spark.table("customers").columns == ["a", "b"]


def test_detect_dataset_type():
    assert detect_dataset_type(["UniqueID", "ltv"]) == "vehicle_loan"
    assert detect_dataset_type(["SK_ID_CURR", "AMT_CREDIT", "TARGET"]) == "home_credit"
    assert detect_dataset_type(["foo", "bar"]) == "generic"


def test_auto_adapt_maps_synonyms(spark):
    df = spark.createDataFrame(
        [("1", 100.0, "01-01-90", 0)],
        "UniqueID string, disbursed_amount double, Date_of_Birth string, loan_default int",
    )
    staged, assertions = auto_adapt(df)
    assert "loan_id" in staged.columns
    assert "loan_amount" in staged.columns
    assert "date_of_birth" in staged.columns
    assert dict(staged.dtypes)["loan_amount"] == "decimal(38,9)"
    assert assertions == [("staged", "not_null", ("loan_id",))]


def test_sanitize_headers(spark):
    df = spark.createDataFrame([(1, 2)], ["a.b", "c.d"])
    assert sanitize_headers(df).columns == ["a_b", "c_d"]
    assert safe_identifier("PERFORM CNS.SCORE") == "PERFORM_CNS_SCORE"


def test_multimodal_decode_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "another document")], "doc_id long, text string"
    )
    bt = multimodal.make_binary_table(docs, "doc_id", "text", "image")
    assert dict(bt.dtypes)["content"] == "binary"
    meta = multimodal.extract_image_meta(bt, fake=True).collect()
    byid = {r["id"]: r for r in meta}
    assert byid[1]["n_bytes"] == len(b"hello world")
    # deterministic fake decode: stable across runs
    again = {r["id"]: r for r in multimodal.extract_image_meta(bt, fake=True).collect()}
    assert byid[1]["width"] == again[1]["width"]
    assert 64 <= byid[1]["width"] < 256


def test_sql_api_surface(spark):
    """The engine is equally usable through spark.sql over registered
    views — same results as the DataFrame formulation."""
    from etl_demos_spark.data import register_views

    register_views(spark, "/root/testdata/sf0.001")
    via_sql = spark.sql(
        """
        SELECT l_returnflag AS flag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS decimal(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY l_returnflag
        """
    )
    import pyspark.sql.functions as F

    li = spark.table("lineitem")
    via_df = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
    )
    a = {r["flag"]: (r["n"], r["sum_qty"]) for r in via_sql.collect()}
    b = {r["flag"]: (r["n"], r["sum_qty"]) for r in via_df.collect()}
    assert a == b


def test_json_source(spark, tmp_path):
    p = tmp_path / "data.json"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    reg = SourceRegistry()
    reg.add(Source(name="js", path=str(p), fmt="json"))
    df = reg.load(spark, "js")
    assert df.count() == 2 and set(df.columns) == {"a", "b"}


def test_engine_facade(spark, tmp_path):
    from etl_demos_spark.engine import Engine

    csv = tmp_path / "auto.csv"
    csv.write_text(
        "UniqueID,disbursed_amount,loan_default\n1,1000.5,0\n2,2000.0,1\n"
    )
    eng = Engine(spark)
    staged = eng.add_source_auto("new_loans", str(csv))
    assert {"loan_id", "loan_amount", "default_flag"} <= set(staged.columns)
    # SQL works over the auto-registered view
    n = eng.sql("SELECT COUNT(*) AS n FROM new_loans WHERE default_flag = 1").collect()
    assert n[0]["n"] == 1


def test_ep3_yaml_persistence_roundtrip(spark, tmp_path):
    """EP3 done-criterion: auto_adapt → persist → fresh registry from
    YAML → identical staging contract (integrate_new_dataset.py:113-242)."""
    from etl_demos_spark.engine import Engine
    from etl_demos_spark.sources.registry import staging_assertions_from_yaml

    csv = tmp_path / "new_loans.csv"
    csv.write_text("UniqueID,disbursed_amount,loan_default\n1,1000.5,0\n2,2000.0,1\n")
    eng = Engine(spark)
    staged = eng.add_source_auto("new_loans", str(csv), persist_dir=str(tmp_path))

    # Restart simulation: a brand-new Engine re-arms from the persisted YAMLs.
    eng2 = Engine(spark)
    eng2.add_sources_yaml(str(tmp_path / "raw_sources.yml"))
    restaged, _ = auto_adapt(eng2.table("new_loans_raw"))
    assert restaged.columns == staged.columns
    assert dict(restaged.dtypes) == dict(staged.dtypes)
    assert restaged.count() == staged.count() == 2

    assertions = staging_assertions_from_yaml(str(tmp_path / "staging.yml"))
    assert ("new_loans", "not_null", ("loan_id",)) in assertions


def test_ep3_yaml_persistence_idempotent_and_preserving(tmp_path):
    """Re-integration converges (no duplicates) and hand-edits survive
    (reference skips existing names, setdefault on the raw block)."""
    import yaml

    from etl_demos_spark.sources.registry import upsert_staging_yaml

    raw_yml = tmp_path / "raw_sources.yml"
    raw_yml.write_text(
        "raw_sources:\n"
        "  - name: customers_raw\n"
        "    project_id: hand-tuned\n"
        "    csv_path: data/customers.csv\n"
    )
    reg = SourceRegistry()
    reg.add(Source(name="customers_raw", path="SHOULD_NOT_CLOBBER.csv"))
    reg.add(Source(name="payments_raw", path="data/payments.csv"))
    reg.to_yaml(str(raw_yml))
    reg.to_yaml(str(raw_yml))  # second run: no-op
    doc = yaml.safe_load(raw_yml.read_text())
    names = [e["name"] for e in doc["raw_sources"]]
    assert names == ["customers_raw", "payments_raw"]
    assert doc["raw_sources"][0]["project_id"] == "hand-tuned"  # preserved
    assert doc["raw_sources"][0]["csv_path"] == "data/customers.csv"

    stg = tmp_path / "staging.yml"
    stg.write_text(
        "version: 2\n"
        "sources:\n"
        "  - name: raw\n"
        "    schema: hand_tuned_schema\n"
        "    tables: [{name: customers_raw}]\n"
        "models:\n"
        "  - name: stg_custom\n"
        "    columns: [{name: loan_id, tests: [not_null, unique]}]\n"
    )
    upsert_staging_yaml(str(stg), "payments_raw", "stg_payments", ("loan_id",))
    upsert_staging_yaml(str(stg), "payments_raw", "stg_payments", ("loan_id",))
    doc = yaml.safe_load(stg.read_text())
    raw_block = doc["sources"][0]
    assert raw_block["schema"] == "hand_tuned_schema"  # setdefault, not overwrite
    assert [t["name"] for t in raw_block["tables"]] == ["customers_raw", "payments_raw"]
    model_names = [m["name"] for m in doc["models"]]
    assert model_names == ["stg_custom", "stg_payments"]
    # hand-edited tests untouched
    assert doc["models"][0]["columns"][0]["tests"] == ["not_null", "unique"]


def test_auto_adapt_days_birth_strategy(spark):
    """Home Credit path: DAYS_BIRTH (negative day offset) becomes a date
    via date_add(current_date(), n) — auto_data_adapter.py:113-135."""
    import datetime as dt

    df = spark.createDataFrame(
        [("1", 50000.0, -10000, 1)],
        "SK_ID_CURR string, AMT_CREDIT double, DAYS_BIRTH int, TARGET int",
    )
    staged, _ = auto_adapt(df)
    row = staged.collect()[0]
    assert row["loan_id"] == "1"
    expected = dt.date.today() + dt.timedelta(days=-10000)
    assert abs((row["date_of_birth"] - expected).days) <= 1  # midnight-race tolerant
    assert row["default_flag"] == 1


def test_csv_quarantine_splits_bad_rows(spark, tmp_path):
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from etl_demos_spark.sources.quarantine import read_csv_quarantine

    csv = tmp_path / "mixed.csv"
    csv.write_text(
        "id,amount,name\n"
        "1,10.5,alice\n"
        "2,notanumber,bob\n"     # bad: amount unparseable
        "3,30.25,carol\n"
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("amount", DoubleType()),
            StructField("name", StringType()),
        ]
    )
    clean, bad = read_csv_quarantine(spark, str(csv), schema)
    assert {r["id"] for r in clean.collect()} == {1, 3}
    bad_rows = [r["raw_line"] for r in bad.collect()]
    assert len(bad_rows) == 1 and "notanumber" in bad_rows[0]


def test_parquet_schema_evolution(spark, tmp_path):
    from etl_demos_spark.sources.quarantine import read_parquet_evolving

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(p)
    df = read_parquet_evolving(spark, p)
    assert set(df.columns) == {"id", "v", "score"}
    got = {r["id"]: r["score"] for r in df.collect()}
    assert got[1] is None and got[2] == 9.5


def test_video_frame_sampling(spark):
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(1, "videobytes-a", 25), (2, "videobytes-b", 3), (3, "x", 0)],
        "doc_id long, text string, n_frames int",
    )
    vt = multimodal.make_video_table(docs, "doc_id", "text", "n_frames")
    assert dict(vt.dtypes)["content"] == "binary"
    plan = multimodal.frame_sample_plan(vt, every_n=10)
    got = sorted((r["id"], r["frame_idx"]) for r in plan.collect())
    # every emitted index < n_frames: the zero-frame video (id 3) emits
    # NOTHING — a phantom frame 0 would crash the per-frame decoder
    assert got == [(1, 0), (1, 10), (1, 20), (2, 0)]


def test_orc_source(spark, tmp_path):
    p = str(tmp_path / "data_orc")
    spark.createDataFrame([(1, "x"), (2, "y")], "a long, b string").write.orc(p)
    reg = SourceRegistry()
    reg.add(Source(name="oc", path=p, fmt="orc"))
    df = reg.load(spark, "oc")
    assert df.count() == 2 and set(df.columns) == {"a", "b"}


def test_arrow_parquet_source_matches_native_scan(spark):
    """The Python DataSource read must be byte-identical to Spark's
    native parquet scan, with one input partition per row group."""
    import pyarrow.parquet as pq

    from etl_demos_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    path = "/root/testdata/sf0.001/customer.parquet"
    df = spark.read.format("arrow_parquet").option("path", path).load()
    native = spark.read.parquet(path)
    assert df.schema == native.schema
    assert {tuple(r) for r in df.collect()} == {
        tuple(r) for r in native.collect()
    }
    assert df.rdd.getNumPartitions() == max(
        pq.ParquetFile(path).num_row_groups, 1
    )


def test_paged_api_source_one_partition_per_page(spark):
    from etl_demos_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    df = spark.read.format("paged_api").option("pages", "3").load()
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 9
    # page assignment is the partition plan, deterministically
    assert {r["page"] for r in rows} == {0, 1, 2}
    assert all(r["craft"] in ("ISS", "Tiangong") for r in rows)


def test_paged_api_streams_one_page_per_microbatch(spark):
    """The streaming half of the Python Data Source API: offset == page
    token, so each micro-batch drains exactly one page and the full
    stream lands on the same 9 rows as the batch read."""
    import time

    from etl_demos_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    q = (
        spark.readStream.format("paged_api")
        .option("pages", "3")
        .load()
        .writeStream.format("memory")
        .queryName("api_stream_t")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        n, batch_rows = 0, []
        while time.time() < deadline and (n < 9 or len(batch_rows) < 3):
            n = spark.sql("select count(*) c from api_stream_t").collect()[0]["c"]
            batch_rows = [
                p["numInputRows"]
                for p in (q.recentProgress or [])
                if p["numInputRows"] > 0
            ]
            time.sleep(0.5)
    finally:
        q.stop()
    got = {
        tuple(r)
        for r in spark.sql("select page, craft, name from api_stream_t").collect()
    }
    want = {
        tuple(r)
        for r in spark.read.format("paged_api").option("pages", "3").load().collect()
    }
    assert got == want and len(got) == 9
    # the offset-pacing contract: each data-bearing micro-batch drained
    # exactly ONE page (3 rows), three of them in total
    assert batch_rows == [3, 3, 3], batch_rows


def test_arrow_parquet_source_reads_nanos_timestamps(spark):
    """events.parquet is TIMESTAMP(NANOS) — Spark's native scan needs
    spark.sql.legacy.parquet.nanosAsLong (and then yields LONG); the
    Python Arrow source reads it directly as a real timestamp column
    (Arrow truncates nanos to micros in the batch transfer). Pin the
    graceful path: typed schema, full row count."""
    from etl_demos_spark.sources.pyds import register_python_sources

    register_python_sources(spark)
    path = "/root/testdata/sf0.001/events.parquet"
    df = spark.read.format("arrow_parquet").option("path", path).load()
    assert dict(df.dtypes)["ts"] == "timestamp"
    from etl_demos_spark.data import load_table

    assert df.count() == load_table(spark, "/root/testdata/sf0.001", "events").count()


def test_auto_adapt_birth_dates_get_the_century_pivot(spark):
    df = spark.createDataFrame(
        [("1", 100.0, "01-01-84", 0), ("2", 50.0, "15-06-05", 1)],
        "UniqueID string, disbursed_amount double, Date_of_Birth string, loan_default int",
    )
    staged, _ = auto_adapt(df)
    got = {r["loan_id"]: str(r["date_of_birth"]) for r in staged.collect()}
    # %y pivot (1969-2068): '84' is 1984, not 2084; '05' stays 2005
    assert got == {"1": "1984-01-01", "2": "2005-06-15"}


def test_registry_yaml_roundtrip_preserves_options(tmp_path):
    from etl_demos_spark.sources.registry import Source, SourceRegistry

    reg = SourceRegistry()
    reg.add(Source(name="piped", path="/data/p.csv", options={"sep": "|"},
                   sanitize=False))
    y = str(tmp_path / "sources.yml")
    reg.to_yaml(y)
    back = SourceRegistry.from_yaml(y)
    s = back.sources["piped"]
    assert s.options == {"sep": "|"} and s.sanitize is False


def test_registry_yaml_missing_path_fails_at_load(tmp_path):
    import pytest
    from etl_demos_spark.sources.registry import SourceRegistry

    y = tmp_path / "bad.yml"
    y.write_text("raw_sources:\n- name: customers\n  cvs_path: /tmp/x.csv\n")
    with pytest.raises(ValueError, match="customers"):
        SourceRegistry.from_yaml(str(y))
    empty = tmp_path / "empty.yml"
    empty.write_text("raw_sources:\n")
    assert SourceRegistry.from_yaml(str(empty)).sources == {}
