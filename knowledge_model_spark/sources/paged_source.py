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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

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


class _QuarantineCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


class QuarantineTsvWriter(DataSourceWriter):
    """Partition-parallel TSV writer with two-phase commit.

    The reference appends ``pmid\\treason`` lines to a single quarantine
    manifest from one process (fetch_pubmed.py:83-90) — a write path
    that cannot scale past one worker and corrupts on crash.  Here each
    task writes its own shard to a staging name and the DRIVER commit
    renames the shards into place; ``abort`` removes the staging files,
    so a failed job leaves no partial manifest (the DataSourceWriter
    two-phase contract).
    """

    def __init__(self, options: dict):
        self.path = options["path"]
        self.cols = [
            c.strip() for c in options.get("columns", "pmid,reason").split(",")
        ]

    def write(self, iterator):
        import os
        import uuid

        part = uuid.uuid4().hex
        staging = os.path.join(self.path, f"_staging-{part}.tsv")
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(staging, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write("\t".join(str(row[c]) for c in self.cols) + "\n")
                n += 1
        return _QuarantineCommit(staging, n)

    def commit(self, messages):
        import os

        for msg in messages:
            if msg is None or msg.n == 0:
                if msg is not None and os.path.exists(msg.path):
                    os.remove(msg.path)
                continue
            final = msg.path.replace("_staging-", "part-")
            os.replace(msg.path, final)

    def abort(self, messages):
        import os

        for msg in messages:
            if msg is not None and os.path.exists(msg.path):
                os.remove(msg.path)


class QuarantineTsvDataSource(DataSource):
    """``df.write.format("quarantine_tsv").option("path", dir).save()``"""

    @classmethod
    def name(cls) -> str:
        return "quarantine_tsv"

    def writer(self, schema, overwrite: bool) -> QuarantineTsvWriter:
        opts = dict(self.options)
        opts.setdefault("columns", ",".join(f.name for f in schema.fields))
        return QuarantineTsvWriter(opts)


def register_quarantine_sink(spark) -> None:
    spark.dataSource.register(QuarantineTsvDataSource)
