"""Local mirror of the driver's correctness gate.

Runs every registry query through Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column names, and values
(column-name-sorted, row-sorted) — the same shape as the driver's
value-hash check, but with a readable diff on failure.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
import pytest

from knowledge_model_spark.plans import load_registry
from knowledge_model_spark.session import TABLE_NAMES

from tests.conftest import SF_DIR

REGISTRY = load_registry()
ORACLE_SPECS = [s for s in REGISTRY.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in REGISTRY.values() if s.oracle is None]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    import numpy as np

    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
            )
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _values_equal(a, b) -> bool:
    # Spark None vs pandas NaT/NaN for null temporals
    a_null = a is None or a is pd.NaT
    b_null = b is None or b is pd.NaT
    if a_null or b_null:
        return a_null and b_null
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # Spark DATE comes back as datetime.date while DuckDB's
    # CAST(date_trunc(...) AS DATE) round-trips through pandas as a
    # midnight Timestamp; the driver's canonicalization equates them,
    # so the local mirror must too.
    if isinstance(a, (datetime.date, datetime.datetime, pd.Timestamp)) and isinstance(
        b, (datetime.date, datetime.datetime, pd.Timestamp)
    ):
        return pd.Timestamp(a) == pd.Timestamp(b)
    return a == b or str(a) == str(b)


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spark, spec):
    sdf = spec.fn(spark, SF_DIR).toPandas()
    con = _duck(SF_DIR)
    odf = con.execute(spec.oracle).df()
    con.close()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{spec.name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{spec.name}: rows spark={len(sdf)} oracle={len(odf)}"

    sc, oc = _canon(sdf), _canon(odf)
    mism = []
    for col in sc.columns:
        sv, ov = sc[col].tolist(), oc[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _values_equal(a, b):
                mism.append((col, i, a, b))
                if len(mism) > 5:
                    break
        if len(mism) > 5:
            break
    assert not mism, f"{spec.name}: value mismatches (col,row,spark,oracle): {mism}"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_runs(spark, spec):
    df = spec.fn(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert df.columns
