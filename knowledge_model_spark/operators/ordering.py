"""Grid-decomposed exact global ordering (no single-partition windows).

A global ``row_number()`` / running-sum window with an empty
``partitionBy`` funnels EVERY row through one task — the classic scale
killer at 10^9+ rows. These helpers compute the SAME exact results with
the two-phase decomposition external-sort engines use:

1. collapse rows onto a *grid* key that is (a) monotone in the sort
   order and (b) bounded in cardinality regardless of corpus size — an
   integer measure, a quantized score, a time bucket. One map-side-
   combinable aggregate, one uniform-key shuffle.
2. cumulative offsets over the grid-level table ONLY. The single-
   partition window here sees at most |grid| rows (dimension-sized, the
   same argument as ``stats_equidepth_histogram``'s cell table), never
   the corpus.
3. a hash-partitioned window *within* each grid cell finishes the exact
   global number as ``offset + local rank`` (or ``offset_sum + local
   running sum``). Cells process in parallel; skew is bounded by the
   largest single cell, not the corpus.

Reference parity: the reference sorts whole corpora in one process
(e.g. ``sorted(src.rglob(...))`` over every record,
knowledge_model/ingestion/build_faiss.py:60); this is the distributed
form with identical output.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_GRID = "__kms_grid"
_VAL = "__kms_val"
_CNT = "__kms_cnt"
_OFF = "__kms_off"


def _join_offsets(g: DataFrame, offs: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Broadcast-join the per-grid offsets back onto the rows,
    NULL-SAFELY (``<=>``): a plain equi-join would silently drop every
    row whose grid expression is NULL, whereas the single-partition
    window forms these helpers replace number those rows (NULLS FIRST
    under ``asc``, NULLS LAST under ``desc`` — exactly where Spark's
    default null ordering places the NULL grid cell in the offsets
    window).  EqualNullSafe is a legal hash-join key, so the plan stays
    a BroadcastHashJoin."""
    b = F.broadcast(offs)
    cond = None
    for k in keys:
        c = g[k].eqNullSafe(b[k])
        cond = c if cond is None else cond & c
    out = g.join(b, cond)
    for k in keys:
        out = out.drop(b[k])
    return out


def _offsets(
    per_grid: DataFrame,
    agg_col: str,
    grid_asc: bool,
    total_as: str | None = None,
) -> DataFrame:
    """Exclusive prefix totals over the grid-level table (bounded rows).

    The ``Window.orderBy`` here is intentionally unpartitioned: its input
    is the per-grid aggregate, whose row count is bounded by grid
    cardinality (|distinct token counts|, |score buckets|, |days|) — not
    by corpus size.

    ``total_as``: also emit the GRAND total of ``agg_col`` as a column —
    an unbounded frame over the same window ordering, so it rides the
    same single pass over the bounded table.  Callers that would
    otherwise run an eager ``df.count()`` (a whole extra corpus scan)
    read the total off the broadcast join instead.
    """
    order = F.col(_GRID).asc() if grid_asc else F.col(_GRID).desc()
    w = (
        Window.orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cols = [
        F.col(_GRID),
        F.coalesce(F.sum(agg_col).over(w), F.lit(0).cast("long")).alias(_OFF),
    ]
    if total_as is not None:
        w_tot = Window.orderBy(order).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        cols.append(F.sum(agg_col).over(w_tot).cast("long").alias(total_as))
    return per_grid.select(*cols)


def grid_global_row_number(
    df: DataFrame,
    grid: Column,
    order_cols: Sequence[Column | str],
    *,
    grid_asc: bool = True,
    out: str = "rn",
    out_total: str | None = None,
) -> DataFrame:
    """Exact global ``row_number()`` under a total order, grid-decomposed.

    ``out_total``: also attach the global row count as a column (the
    plan-side replacement for an eager ``df.count()`` — it derives from
    the grid-count aggregate this function already computes, so asking
    for it costs zero extra scans).

    ``grid`` must be monotone in the order: if row a precedes row b in
    ``order_cols`` order, then grid(a) <= grid(b) when ``grid_asc`` else
    grid(a) >= grid(b). Ties in grid are resolved exactly by the
    within-cell window over ``order_cols``. A NULL grid is allowed and
    forms its own cell, numbered NULLS FIRST under ``grid_asc`` / NULLS
    LAST otherwise — the same place the single-window form puts NULL
    order keys — provided the NULL cell respects the monotone contract
    (i.e. NULL grid rows sort first/last in ``order_cols`` too).
    """
    g = df.withColumn(_GRID, grid)
    counts = g.groupBy(_GRID).agg(F.count("*").cast("long").alias(_CNT))
    offs = _offsets(counts, _CNT, grid_asc, total_as=out_total)
    local = Window.partitionBy(_GRID).orderBy(*order_cols)
    return (
        _join_offsets(g, offs, [_GRID])
        .withColumn(
            out,
            (F.col(_OFF) + F.row_number().over(local)).cast("long"),
        )
        .drop(_GRID, _OFF)
    )


def grid_global_running_sum(
    df: DataFrame,
    grid: Column,
    order_cols: Sequence[Column | str],
    val: Column,
    *,
    grid_asc: bool = True,
    out: str = "cum",
) -> DataFrame:
    """Exact inclusive global running sum of ``val`` under a total order.

    Same monotone-grid (and NULL-cell) contract as
    :func:`grid_global_row_number`. Keep ``val`` integral (counts, token
    lengths, micros) so the decomposed sum is bit-identical to the
    single-window form regardless of fold order.
    """
    g = df.withColumn(_GRID, grid).withColumn(_VAL, val)
    totals = g.groupBy(_GRID).agg(F.sum(_VAL).cast("long").alias(_CNT))
    offs = _offsets(totals, _CNT, grid_asc)
    local = (
        Window.partitionBy(_GRID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _join_offsets(g, offs, [_GRID])
        .withColumn(out, (F.col(_OFF) + F.sum(_VAL).over(local)).cast("long"))
        .drop(_GRID, _VAL, _OFF)
    )


def grid_partitioned_rank_and_sum(
    df: DataFrame,
    partition_cols: Sequence[str],
    grid: Column,
    order_cols: Sequence[Column | str],
    val: Column,
    *,
    out_rn: str = "rn",
    out_cum: str = "cum",
) -> DataFrame:
    """Exact per-partition ``row_number()`` AND inclusive running sum of
    ``val`` under a total order, grid-decomposed — for PARTITIONED
    windows whose partitions are themselves corpus-sized (a handful of
    event types over 10^9 events: per-key rows ≈ corpus/k, and AQE can
    split neither a window partition nor its sort).

    Same monotone-grid (and NULL-cell) contract as
    :func:`grid_global_row_number`, applied within each partition key
    (NULL partition keys are likewise retained — the window form groups
    them): one map-side-combinable
    (keys × grid) aggregate computes counts and sums together, the
    offsets window runs per key over the grid-level table only
    (bounded by |grid| rows per key — days, buckets), and one
    hash-partitioned (keys, grid) window finishes both outputs as
    offset + local. Keep ``val`` integral so the decomposed sum is
    bit-identical to the single-window form.
    """
    part = list(partition_cols)
    g = df.withColumn(_GRID, grid).withColumn(_VAL, val)
    per = g.groupBy(*part, _GRID).agg(
        F.count("*").cast("long").alias(_CNT),
        F.sum(_VAL).cast("long").alias("__kms_sum"),
    )
    woff = (
        Window.partitionBy(*part)
        .orderBy(F.col(_GRID).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = per.select(
        *part,
        _GRID,
        F.coalesce(F.sum(_CNT).over(woff), F.lit(0).cast("long")).alias(_OFF),
        F.coalesce(
            F.sum("__kms_sum").over(woff), F.lit(0).cast("long")
        ).alias("__kms_soff"),
    )
    local = Window.partitionBy(*part, _GRID).orderBy(*order_cols)
    local_sum = local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        _join_offsets(g, offs, part + [_GRID])
        .withColumn(out_rn, (F.col(_OFF) + F.row_number().over(local)).cast("long"))
        .withColumn(
            out_cum,
            (F.col("__kms_soff") + F.sum(_VAL).over(local_sum)).cast("long"),
        )
        .drop(_GRID, _VAL, _OFF, "__kms_soff")
    )
