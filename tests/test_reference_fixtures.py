"""End-to-end parity run over the reference's OWN CSV fixtures (read-only
at /root/reference/data) — the 'switch engines without changing your
data' proof: ingest via the source registry, build all 13 models, pass
the same dbt-test invariants the reference asserts (staging.yml:12-28,
marts_core.yml:3-16), and check the documented fixture counts
(FIXTURES.md / BASELINE.md)."""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.functions as F
import pytest

from etl_demos_spark.plans.bank_pipeline import build_bank_pipeline
from etl_demos_spark.sources.registry import Source, SourceRegistry

REF_DATA = Path("/root/reference/data")

pytestmark = pytest.mark.skipif(
    not (REF_DATA / "customers.csv").exists(), reason="reference fixtures not present"
)


@pytest.fixture(scope="module")
def ref_sources(spark):
    reg = SourceRegistry()
    reg.add(Source(name="customers", path=str(REF_DATA / "customers.csv")))
    reg.add(Source(name="loan_applications", path=str(REF_DATA / "auto_loan_default.csv")))
    reg.add(Source(name="payments", path=str(REF_DATA / "payments.csv")))
    return {name: reg.load(spark, name) for name in reg.sources}


def test_reference_fixture_pipeline(spark, ref_sources, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("ref_wh"))
    p = build_bank_pipeline(warehouse_dir=wh)
    built = p.run(spark, ref_sources, check=True)  # quality gate = dbt test

    # documented fixture scale (BASELINE.md)
    assert built["stg_corebank_customers"].count() == 500
    assert built["f_loan_contract"].count() == 2000
    assert built["stg_payments"].count() == 23272

    # payments: 2000 distinct loans, 3 channels (BASELINE.md)
    pay = built["f_payment_transaction"]
    assert pay.select("loan_id").distinct().count() == 2000
    assert pay.select("channel_key").distinct().count() == 3

    # star keys resolve for every loan (each fixture loan has a customer)
    flc = built["f_loan_contract"]
    assert flc.filter(F.col("customer_key").isNull()).count() == 0
    assert flc.filter(F.col("application_date_key").isNull()).count() == 0

    # ~4.5% default rate → 91 default events (FIXTURES.md)
    assert built["f_default_event"].count() == 91

    # dims are dense 1..N
    dc = built["dim_customer"]
    keys = [r["customer_key"] for r in dc.select("customer_key").collect()]
    assert sorted(keys) == list(range(1, 501))
