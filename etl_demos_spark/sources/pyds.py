"""Spark 4 Python Data Source API — the modern extension point for
sources Spark has no native reader for (internal services, proprietary
formats, paged APIs).

Reference anchor: rytakahas/etl-demos ingests via hand-rolled Python
(include/auto_data_adapter.py:16-172 sniffs and adapts arbitrary
uploads; exampledag.py:49-75 pages a REST API). On Spark 4 the
idiomatic port of "custom Python ingest" is a registered DataSource:
partition planning happens ONCE on the driver (cheap metadata), each
task fetches its own partition on an executor, and rows travel as Arrow
RecordBatches — so a custom Python source still scales out and still
skips row-at-a-time serialization.

Two sources:

- ``ArrowParquetDataSource`` ("arrow_parquet"): reads parquet through
  pyarrow with ONE InputPartition PER ROW GROUP and yields Arrow
  RecordBatches directly. Deliberately redundant with Spark's native
  scan — the point is pinning the custom-source machinery against a
  byte-identical native baseline (tests do exactly that), the same
  oracle discipline as everywhere else. Real use: the same skeleton
  reads any pyarrow-supported or in-house format.

- ``PagedApiDataSource`` ("paged_api"): the reference's paged-REST
  ingest shape — the driver plans one InputPartition per page token,
  each task "fetches" its page (here: a deterministic local fixture —
  the sandbox has no network, mirroring the reference's own hardcoded
  fallback at exampledag.py:60-66). Swap ``_fetch_page`` for a real
  HTTP call and the parallelism story is unchanged.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class ArrowParquetDataSource(DataSource):
    """format("arrow_parquet").option("path", ...) — row-group-parallel
    pyarrow reads, Arrow batches end to end."""

    @classmethod
    def name(cls) -> str:
        return "arrow_parquet"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(pq.read_schema(self.options["path"]))

    def reader(self, schema) -> DataSourceReader:
        return _ArrowParquetReader(self.options["path"])


class _ArrowParquetReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).num_row_groups
        return [InputPartition(i) for i in range(max(n, 1))]

    def read(self, partition):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(self.path)
        if f.num_row_groups == 0:
            return
        for batch in f.iter_batches(row_groups=[partition.value]):
            yield batch


_PAGE_SIZE = 3
_CREW = [
    ("ISS", "Oleg Kononenko"),
    ("ISS", "Nikolai Chub"),
    ("ISS", "Tracy Caldwell Dyson"),
    ("ISS", "Matthew Dominick"),
    ("ISS", "Michael Barratt"),
    ("ISS", "Jeanette Epps"),
    ("Tiangong", "Ye Guangfu"),
    ("Tiangong", "Li Cong"),
    ("Tiangong", "Li Guangsu"),
]


def _fetch_page(page: int) -> list[tuple[str, str]]:
    """One 'API page'. Deterministic local fixture standing in for the
    HTTP GET (no network in this sandbox — the reference's own fallback
    path); a real deployment swaps only this function."""
    return _CREW[page * _PAGE_SIZE : (page + 1) * _PAGE_SIZE]


class PagedApiDataSource(DataSource):
    """format("paged_api").option("pages", n) — one task per page."""

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return "page int, craft string, name string"

    def reader(self, schema) -> DataSourceReader:
        return _PagedApiReader(int(self.options.get("pages", "3")))

    def simpleStreamReader(self, schema):
        return _PagedApiStreamReader(int(self.options.get("pages", "3")))


class _PagedApiReader(DataSourceReader):
    def __init__(self, pages: int):
        self.pages = pages

    def partitions(self):
        return [InputPartition(i) for i in range(self.pages)]

    def read(self, partition):
        page = partition.value
        for craft, name in _fetch_page(page):
            yield (page, craft, name)


def register_python_sources(spark) -> None:
    """Idempotent registration of both sources on a session."""
    spark.dataSource.register(ArrowParquetDataSource)
    spark.dataSource.register(PagedApiDataSource)


class _PagedApiStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader for ``paged_api``: the offset IS the
    page token — each ``read`` drains exactly one page and hands back
    the next token, so one micro-batch == one API page and failure
    recovery replays pages deterministically via readBetweenOffsets
    (the page fetch is a pure function of the token). Past the last
    page the reader returns an empty slice with an unmoved offset —
    a live deployment would keep polling the API for new pages."""

    def __init__(self, pages: int):
        self.pages = pages

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        p = int(start["page"])
        if p >= self.pages:
            return iter([]), start
        rows = [(p, craft, name) for craft, name in _fetch_page(p)]
        return iter(rows), {"page": p + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for p in range(int(start["page"]), int(end["page"])):
            for craft, name in _fetch_page(p):
                yield (p, craft, name)

    def commit(self, end: dict) -> None:
        pass
