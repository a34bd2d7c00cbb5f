"""Local mirror of the driver's correctness gate.

Runs every registry query through Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column names, and values
(column-name-sorted, row-sorted) — the same shape as the driver's
value-hash check, but with a readable diff on failure.
"""

from __future__ import annotations

import datetime
import math
import numbers

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
    # Driver-faithful int/float distinction: the driver's value hash is
    # representation-sensitive, so an integral float on one side (e.g.
    # DuckDB HUGEINT materialized by pandas as float64 → "1234.0") does
    # NOT equal an integer on the other ("1234").  Python's `1234.0 ==
    # 1234` let exactly that class escape in r8 (events_rfm_scores).
    a_int = isinstance(a, numbers.Integral) and not isinstance(a, bool)
    b_int = isinstance(b, numbers.Integral) and not isinstance(b, bool)
    a_float = isinstance(a, numbers.Real) and not a_int and not isinstance(a, bool)
    b_float = isinstance(b, numbers.Real) and not b_int and not isinstance(b, bool)
    if (a_int and b_float) or (a_float and b_int):
        return False
    if a_float and b_float:
        a, b = float(a), float(b)
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


def test_values_equal_is_representation_sensitive():
    """The r8 escape class: an integral float must NOT equal an int.

    DuckDB's sum(BIGINT) returns HUGEINT, which pandas materializes as
    float64; the driver's value hash sees "1234.0" vs Spark's "1234" and
    goes red even though the values are numerically identical.  The old
    mirror used Python `==` (1234.0 == 1234 → True) and let it through.
    """
    import numpy as np

    assert not _values_equal(1234, 1234.0)
    assert not _values_equal(np.int64(1234), np.float64(1234.0))
    assert not _values_equal(1234.0, np.int64(1234))
    assert _values_equal(np.int64(7), 7)
    assert _values_equal(np.float64(7.5), 7.5)
    assert _values_equal(float("nan"), np.float64("nan"))
    assert _values_equal(True, np.bool_(True))


def test_rfm_oracle_monetary_stays_integer():
    """events_rfm_scores' oracle must hand pandas an integer column.

    Without the outer CAST(... AS BIGINT), DuckDB's HUGEINT sum widens
    to float64 in pandas — the exact typing artifact behind the only
    red driver row of r8.  This fails on the old oracle text.
    """
    con = _duck(SF_DIR)
    odf = con.execute(REGISTRY["events_rfm_scores"].oracle).df()
    con.close()
    assert odf["monetary_micros"].dtype.kind in "iu", (
        f"monetary_micros widened to {odf['monetary_micros'].dtype}; "
        "HUGEINT leaked through the oracle (missing CAST AS BIGINT)"
    )
    assert odf["frequency"].dtype.kind in "iu"
    assert odf["recency_days"].dtype.kind in "iu"


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_runs(spark, spec):
    df = spec.fn(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert df.columns
