"""Query catalog: every declared operator as a (spark_fn, oracle_sql) pair.

``REGISTRY`` maps query name → QuerySpec.  The driver contract
(`__spark_entry__.py`) is generated from this registry: ``queries()``
returns the Spark callables, ``oracle_sql()`` the DuckDB-equivalent SQL
for every oracle-checkable entry.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → rows-only check (non-SQL-expressible)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: fills REGISTRY)."""
    from knowledge_model_spark.plans import (  # noqa: F401
        relational_queries,
        text_queries,
        dedup_queries,
        events_queries,
        similarity_queries,
        retrieval_queries,
        pipeline_queries,
        postprocess_queries,
    )

    return REGISTRY
