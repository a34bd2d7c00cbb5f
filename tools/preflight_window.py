#!/usr/bin/env python
"""Driver-equivalent pre-flight of the correctness-gate window.

Runs the FIRST 50 registry entries (exactly the slice the driver
certifies) through Spark AND their DuckDB oracles at the driver's
oracle scale, comparing rows + schema + bit-exact values — stricter
than the driver's value hash, with a readable per-query verdict.

    python tools/preflight_window.py            # sf0.01, first 50
    python tools/preflight_window.py 80         # widen the slice
    SPARK_GRAFT_ORACLE_SF_DIR=... python tools/preflight_window.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from knowledge_model_spark.plans import load_registry  # noqa: E402
from knowledge_model_spark.session import TABLE_NAMES, get_spark  # noqa: E402

from tests.test_oracle_parity import _canon, _values_equal  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def main(n: int) -> int:
    spark = get_spark("preflight")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    registry = load_registry()
    window = list(registry)[:n]
    bad: list[tuple[str, str]] = []
    for i, name in enumerate(window, 1):
        spec = registry[name]
        t0 = time.time()
        try:
            if spec.oracle is None:
                status = "ROWS-ONLY IN WINDOW"
            else:
                s = _canon(spec.fn(spark, SF).toPandas())
                o = _canon(con.sql(spec.oracle).df())
                ok = (
                    list(s.columns) == list(o.columns)
                    and len(s) == len(o)
                    and all(
                        _values_equal(a, b)
                        for c in s.columns
                        for a, b in zip(s[c], o[c])
                    )
                )
                status = "ok" if ok else "MISMATCH"
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            status = f"ERROR {type(e).__name__}: {e}"[:120]
        if status != "ok":
            bad.append((name, status))
        print(f"[{i}/{n}] {name}: {status} ({time.time() - t0:.1f}s)", flush=True)
    print("BAD:", bad if bad else f"none — {n}/{n} green")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 50))
