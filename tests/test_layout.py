"""Z-order layout: prove the file-skipping claim.

A single-dim-sorted layout prunes scans on that dim only; the z-ordered
layout must carry bounded per-file ranges on EVERY interleaved dim.  We
write the same table both ways, then — using exactly the pruning an
engine does with parquet footer stats — count the files whose [min,max]
intersects a narrow single-dimension band.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from knowledge_model_spark.operators.layout import write_zordered, zorder_key


def _files_touched(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(files whose [min,max] intersects [lo,hi], total files)."""
    touched, total = 0, 0
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        total += 1
        md = pq.read_metadata(f)
        cmin, cmax = None, None
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            cmin = st.min if cmin is None else min(cmin, st.min)
            cmax = st.max if cmax is None else max(cmax, st.max)
        if cmax >= lo and cmin <= hi:
            touched += 1
    return touched, total


def test_zorder_layout_prunes_on_every_dim(spark, tmp_path):
    # sf0.01: enough rows (15k) that range-partition boundaries are
    # stable; a single 10%-band can straddle the curve's top-level
    # split, so the metric is the MEAN over 9 band positions — the
    # random-point-query cost an engine actually pays
    from knowledge_model_spark.session import load_tables
    from tests.conftest import ORACLE_SF_DIR

    base = load_tables(spark, ORACLE_SF_DIR)["orders"].select(
        "o_orderkey",
        F.expr("unix_date(cast(o_orderdate as date))").alias("d"),
        F.col("o_custkey").alias("k"),
    )
    b = base.agg(F.min("d"), F.max("d"), F.min("k"), F.max("k")).collect()[0]
    dlo, dhi, klo, khi = b
    n_files = 16

    zpath = str(tmp_path / "zorder")
    write_zordered(
        base, ["d", "k"], [(dlo, dhi), (klo, khi)], zpath, n_files=n_files, bits=10
    )
    kpath = str(tmp_path / "ksorted")
    (
        base.repartitionByRange(n_files, F.col("k"))
        .sortWithinPartitions("k")
        .write.mode("overwrite")
        .parquet(kpath)
    )

    fracs = (0.05, 0.15, 0.25, 0.35, 0.45, 0.55, 0.65, 0.75, 0.85)

    def mean_touched(path, col, lo, hi):
        touched = []
        for fr in fracs:
            band = (lo + int(fr * (hi - lo)), lo + int((fr + 0.1) * (hi - lo)))
            n, tot = _files_touched(path, col, *band)
            assert tot == n_files
            touched.append(n)
        return sum(touched) / len(touched)

    zd = mean_touched(zpath, "d", dlo, dhi)
    zk = mean_touched(zpath, "k", klo, khi)
    sd = mean_touched(kpath, "d", dlo, dhi)

    # control: the single-dim layout reads EVERY file for the other dim
    assert sd == n_files, sd
    # z-order: bounded pruning on BOTH dims (measured ~6.0 and ~7.9)
    assert zd <= 10, f"zorder d-band mean {zd}/{n_files}"
    assert zk <= 10, f"zorder k-band mean {zk}/{n_files}"


def test_zorder_roundtrip_preserves_rows(spark, tables, tmp_path):
    base = tables["orders"].select("o_orderkey", "o_custkey")
    df = base.withColumn("d", F.col("o_orderkey") % 1000).withColumn(
        "k", F.col("o_custkey")
    )
    path = str(tmp_path / "rt")
    write_zordered(df, ["d", "k"], [(0, 999), (1, 200000)], path, n_files=4, bits=10)
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
    a = sorted(r["o_orderkey"] for r in back.select("o_orderkey").collect())
    c = sorted(r["o_orderkey"] for r in df.select("o_orderkey").collect())
    assert a == c


def test_zorder_key_locality(spark):
    # contiguous z-ranges are rectangles: check that sorting by zkey
    # groups rows whose (x, y) are jointly close — the mean per-window
    # bounding-box area over z-sorted windows must be far below random
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") * 37 % 64).alias("y")
    )
    keyed = zorder_key(df, ["x", "y"], [(0, 63), (0, 63)], bits=6).orderBy("zkey")
    rows = keyed.collect()
    win = 64
    areas = []
    for i in range(0, len(rows) - win, win):
        chunk = rows[i : i + win]
        xs = [r["x"] for r in chunk]
        ys = [r["y"] for r in chunk]
        areas.append((max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1))
    mean_area = sum(areas) / len(areas)
    # 64 cells of a 64x64 grid: perfect tiling is area 64; random order
    # would be ~4096 — require within 4x of perfect
    assert mean_area <= 256, mean_area


def test_zorder_skipping_diagnostic_prunes_both_dims(spark):
    """layout_zorder_skipping: the registered skipping proof must show
    BOTH single-dimension bands pruning the large majority of files —
    the property a single-dim sort cannot give — plus basic accounting
    sanity (row conservation, conjunction at least as selective as
    either band)."""
    from knowledge_model_spark.plans import load_registry

    R = load_registry()
    rows = R["layout_zorder_skipping"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    n = len(rows)
    assert n > 50  # the z-range binning actually spread the table
    assert sum(r.n_rows for r in rows) == spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).count()
    skip_d = sum(r.skip_date_band for r in rows)
    skip_k = sum(r.skip_cust_band for r in rows)
    skip_c = sum(r.skip_conjunction for r in rows)
    assert skip_d >= 0.8 * n and skip_k >= 0.8 * n
    assert skip_c >= max(skip_d, skip_k)
    # every per-file stat interval is consistent
    assert all(r.d_min <= r.d_max and r.k_min <= r.k_max for r in rows)
