"""Edit-distance similarity self-join (Ed-Join-style q-gram prefix filter).

The reference links near-identical entity names (journal titles, author
strings) before keying records — an exact-distance fuzzy join.  A naive
implementation is the all-pairs ``levenshtein`` cross join: O(n²) string
comparisons, a non-starter at corpus scale.  This module re-expresses it
Spark-first as candidate generation + exact verify:

1. **Positional q-grams.**  Each string of length L yields L-q+1 grams.
   One edit (insert/delete/substitute) destroys at most ``q`` grams, so
   two strings within edit distance ``k`` share at least
   ``(min_len - q + 1) - k*q`` grams.  For strings of length
   ≥ ``q*(k+1)``, that bound is ≥ 1 — sharing a gram is a NECESSARY
   condition and the gram equi-join is a lossless candidate generator.
2. **Prefix filter (the scale lever).**  Joining on ALL grams costs
   Σ_g df(g)² — hot boilerplate grams ("er", "re") dominate.  Sort each
   string's gram bag by global frequency (rarest first, deterministic
   gram/position tiebreak) and keep only the first ``k*q + 1`` grams:
   since at most ``k*q`` grams of a true pair can be non-shared, every
   pair within distance k still shares a gram inside BOTH prefixes.
   Join cost becomes Σ over the rarest grams only — the Ed-Join result
   (Xiao et al., VLDB'08), built here from groupBy + window, no UDF.
3. **Exact verify.**  Candidates (a superset) are checked with the
   built-in JVM ``levenshtein`` — the output is exactly the brute-force
   result, which is what the DuckDB oracle computes.

Scale shape: gram df is a broadcastable term-level aggregate; the
candidate join shuffles only (gram, id, len) slivers; strings travel
once in the final slim verify join.  No cross join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grams(strings: DataFrame, q: int) -> DataFrame:
    """(id, len, pos, gram) positional q-gram bag (callers pre-filter to
    strings long enough for the gram bound to hold)."""
    return strings.select(
        "id",
        "len",
        F.posexplode(
            F.expr(f"transform(sequence(1, len - {q} + 1), i -> substring(s, i, {q}))")
        ).alias("pos", "gram"),
    )


def qgram_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    q: int = 2,
    prefix_filter: bool = True,
) -> DataFrame:
    """All pairs (id_a < id_b) with ``levenshtein(s_a, s_b) <= max_dist``.

    Exact for ALL lengths: pairs whose shorter string has ≥ ``q*(k+1)``
    chars go through the lossless gram path; pairs involving a shorter
    string (where gram-sharing is NOT a necessary condition — "a" vs "b"
    share no gram at distance 1) go through a length-banded sidecar that
    pairs the few short strings against every string within ``k`` of
    their length and verifies exactly.  The two paths partition the pair
    space (sidecar ⇔ shorter side below threshold), so the union is
    duplicate-free.  ``prefix_filter=False`` joins on every gram — the
    test-only baseline the pruned path is asserted equal to.

    Returns (id_a, id_b, dist); deterministic under any partitioning —
    candidate sets are ``distinct`` and the verify is exact.
    """
    k = max_dist
    thresh = q * (k + 1)
    strings = df.select(
        F.col(id_col).alias("id"),
        F.lower(F.col(str_col)).alias("s"),
    ).withColumn("len", F.length("s"))

    grams = _grams(strings.filter(F.col("len") >= thresh), q)

    if prefix_filter:
        # Global gram frequencies as a window on the gram partition —
        # the df of a gram is a fact about the gram partition, so it
        # costs one shuffle instead of the former groupBy + join-back
        # (which re-ran the gram explode per consumer).  Rarest-first
        # with (gram, pos) tiebreak keeps the per-id prefix choice
        # deterministic across runs.
        w = Window.partitionBy("id").orderBy("gdf", "gram", "pos")
        grams = (
            grams.withColumn(
                "gdf", F.count("*").over(Window.partitionBy("gram"))
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k * q + 1)
            .select("id", "len", "gram")
        )
    else:
        grams = grams.select("id", "len", "gram")

    # the pruned gram table feeds BOTH sides of the self-join below;
    # materialize it once (and expose accurate stats to the join
    # planner) instead of recomputing the explode + prefix pipeline
    # per side
    grams = grams.localCheckpoint(eager=True)

    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.len") - F.col("b.len")) <= k),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    # Short-string sidecar: strings below the gram-bound threshold are
    # few (none at all in name-like data); pair each against every
    # string within k of its length — a broadcast nested-loop over a
    # tiny side — normalizing (least, greatest) so short×short pairs
    # appearing from either side dedupe.  Condition "shorter side below
    # threshold" makes sidecar and gram path disjoint.
    shorts = strings.filter(F.col("len") < thresh)
    side = (
        shorts.alias("a")
        .join(
            strings.alias("b"),
            (F.col("a.id") != F.col("b.id"))
            & (F.abs(F.col("a.len") - F.col("b.len")) <= k),
        )
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .distinct()
    )

    sa = strings.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    sb = strings.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    return (
        cand.unionByName(side)
        .join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= k)
        .select("id_a", "id_b", "dist")
    )
