#!/usr/bin/env python
"""Runnable example: the reference's full workflow on this engine.

    python examples/bank_warehouse.py [data_dir] [warehouse_dir]

data_dir must hold the reference-shaped CSVs (customers.csv,
auto_loan_default.csv, payments.csv) — defaults to the reference's own
fixtures if present.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_demos_spark.engine import Engine


def main() -> int:
    data_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/reference/data")
    wh = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="bank_wh_")
    if not (data_dir / "customers.csv").exists():
        print(f"no customers.csv under {data_dir}", file=sys.stderr)
        return 1

    eng = Engine.local("bank-warehouse-example")
    eng.spark.sparkContext.setLogLevel("ERROR")
    eng.add_csv("customers", str(data_dir / "customers.csv"))
    eng.add_csv("loan_applications", str(data_dir / "auto_loan_default.csv"))
    eng.add_csv("payments", str(data_dir / "payments.csv"))

    built = eng.run_warehouse(wh)  # raises on dbt-style quality violations
    print(f"built {len(built)} models into {wh}; quality gate passed")

    print("\nDefault rate by product (SQL over built models):")
    eng.sql(
        """
        SELECT p.product_id,
               COUNT(*) AS n_loans,
               SUM(f.loan_default) AS n_defaults,
               ROUND(100.0 * SUM(f.loan_default) / COUNT(*), 2) AS default_pct
        FROM f_loan_contract f
        JOIN dim_product p ON f.product_key = p.product_key
        GROUP BY p.product_id
        ORDER BY default_pct DESC
        """
    ).show()

    print("Monthly payment volume (top 6):")
    eng.sql(
        """
        SELECT CAST(payment_date_key / 100 AS INT) AS yyyymm,
               COUNT(*) AS n_payments,
               ROUND(SUM(amount), 2) AS total
        FROM f_payment_transaction
        GROUP BY yyyymm ORDER BY total DESC LIMIT 6
        """
    ).show()
    return 0


if __name__ == "__main__":
    sys.exit(main())
