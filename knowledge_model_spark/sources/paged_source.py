"""First-class Spark Data Source for the reference's paged record scan
(Python Data Source API, Spark 4).

The reference pages through PubMed ESearch/EFetch with a ``retstart``
cursor (fetch_pubmed.py:108-146, 323-342); `fetch_connector.py` already
re-expresses that as a mapPartitions connector.  This module lifts the
same contract into the engine-native surface — a registered
``spark.read.format("paged_records")`` source — so a paged upstream
looks like any other table: schema known up front, ONE InputPartition
per page (Spark schedules pages across executors; a slow page doesn't
block the others), and ``offset`` giving retstart-style resume.

The transport here is the deterministic in-repo fake (pure function of
the record id, same convention as the fetch-connector tests — never a
live endpoint from tests); a live HTTP transport would replace
``_record`` only, keeping partition planning, schema, and resume
untouched.  Per the Python DS contract, heavy imports and connections
belong in ``read()`` (executor-side), never in ``partitions()``.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "rec_id bigint, pmid string, title string, body string, page int"


def _record(i: int, page: int) -> tuple:
    """Deterministic fake transport: record content is a pure function
    of the id (the live-HTTP seam — swap this, keep everything else)."""
    pmid = str(10_000_000 + i)
    title = f"Synthetic article {i}"
    body = f"body-{i}-" + format(i * 2654435761 % 2**32, "08x")
    return (i, pmid, title, body, page)


class _PagePartition(InputPartition):
    def __init__(self, start: int, end: int, page: int):
        self.start = start
        self.end = end
        self.page = page


class PagedRecordsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.total = int(options.get("total", 1000))
        self.page_size = int(options.get("page_size", 100))
        self.offset = int(options.get("offset", 0))

    def partitions(self):
        parts = []
        page = self.offset // self.page_size
        start = self.offset
        while start < self.total:
            end = min(start + self.page_size, self.total)
            parts.append(_PagePartition(start, end, page))
            start = end
            page += 1
        # zero-page reads still need one (empty) partition — Spark
        # requires at least one
        return parts or [_PagePartition(0, 0, 0)]

    def read(self, partition: _PagePartition):
        for i in range(partition.start, partition.end):
            yield _record(i, partition.page)


class PagedRecordsStreamReader:
    """Incremental (streaming) cursor over the same paged upstream —
    the reference's monthly continuous pull (pipelines/flows/
    continuous.py) as a NATIVE streaming source: the offset dict is the
    retstart cursor, checkpointed by Spark, so a stopped query resumes
    exactly where the listing left off (mid-stream crash recovery for
    free).  Each micro-batch advances the cursor by at most
    ``max_pages_per_batch`` pages — bounded batches, AvailableNow
    drains to the current ``total``.

    Implements the SimpleDataSourceStreamReader contract (offsets are
    plain dicts; ``read(start)`` returns (rows, next_offset)).
    """

    def __init__(self, options: dict):
        self.total = int(options.get("total", 1000))
        self.page_size = int(options.get("page_size", 100))
        self.max_pages = int(options.get("max_pages_per_batch", 2))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = int(start["pos"])
        end = min(pos + self.page_size * self.max_pages, self.total)
        # iter(list), not a bare generator: the runtime both advances
        # the iterator and pickles it for its prefetch cache — a
        # list_iterator supports both; size is bounded by
        # page_size × max_pages
        rows = [_record(i, i // self.page_size) for i in range(pos, end)]
        return iter(rows), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay for recovery: same pure transport
        return iter(
            [
                _record(i, i // self.page_size)
                for i in range(int(start["pos"]), int(end["pos"]))
            ]
        )

    def commit(self, end: dict) -> None:
        pass


class PagedRecordsDataSource(DataSource):
    """``spark.read.format("paged_records").option("total", N)
    .option("page_size", P).option("offset", R).load()`` — batch; or
    ``spark.readStream.format("paged_records")`` for the incremental
    cursor (offsets checkpointed by the engine)."""

    @classmethod
    def name(cls) -> str:
        return "paged_records"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> PagedRecordsReader:
        return PagedRecordsReader(self.options)

    def simpleStreamReader(self, schema) -> PagedRecordsStreamReader:
        return PagedRecordsStreamReader(self.options)


def register_paged_source(spark) -> None:
    spark.dataSource.register(PagedRecordsDataSource)
