"""Every runnable example must stay runnable — executed at the smallest
scale factor (they each accept an sf_dir argument)."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

EXAMPLES = [
    "corpus_cleaning.py",
    "web_curation.py",
    "tokenizer_pipeline.py",
    "vector_search.py",
    "query_acceleration.py",
    "data_selection.py",
    "graph_analytics.py",
    "event_analytics.py",
    "multimodal_curation.py",
]
EX_DIR = Path(__file__).resolve().parent.parent / "examples"


def _run(name: str, argv: list[str]) -> int:
    spec = importlib.util.spec_from_file_location(f"ex_{name[:-3]}", EX_DIR / name)
    mod = importlib.util.module_from_spec(spec)
    old = sys.argv
    sys.argv = [name] + argv
    try:
        spec.loader.exec_module(mod)
        return mod.main()
    finally:
        sys.argv = old


@pytest.mark.slow
@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(spark, name):
    assert _run(name, ["/root/testdata/sf0.001"]) == 0


@pytest.mark.slow
def test_bank_warehouse_example_runs(spark):
    # runs over the reference's own CSVs (no sf_dir argument)
    assert _run("bank_warehouse.py", []) == 0
