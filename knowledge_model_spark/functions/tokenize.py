"""BPE-style subword tokenization as engine expressions.

The reference tokenizes with a HF tokenizer inside training/inference
(train_lora.py:76-112); a data pipeline needs token-level statistics at
corpus scan speed long before a model sees anything.  Two pieces:

- ``learn_bpe_merges``: the greedy BPE training loop as Spark jobs —
  ONE corpus scan reduces to a weighted word table, then each round
  counts adjacent symbol pairs over that vocab-sized table (explode +
  groupBy, map-side combined) and promotes the most frequent pair; the
  driver holds only the merge table (one pair per round, like the PQ /
  Lloyd precedent).  Deterministic: ties break lexicographically.
- ``bpe_tokens_expr`` / ``bpe_sql``: APPLY a (frozen) merge table as a
  chain of plain ``replace`` calls over space-separated symbols.  One
  left-to-right non-overlapping replace pass per merge, in rank order —
  semantics chosen precisely because Spark's ``replace`` and DuckDB's
  ``replace`` agree on it exactly, which makes tokenization
  oracle-checkable (`text_bpe_tokenize`).  This is the "fast BPE"
  application order; the per-word min-rank loop of subword-nmt differs
  only on adversarial merge tables, not greedily-learned ones.

At 100 TB the apply path is pure whole-stage-codegen string expressions
(zero Python); learning cost is (rounds × one pair-count shuffle) over
however much of the corpus you sample into it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NORM_SQL = "regexp_replace(lower({col}), '[^a-z0-9 ]', ' ')"


def _spaced_words(col: str) -> str:
    """Spark SQL: words of the normalized text, each as space-separated
    characters (the BPE symbol string)."""
    norm = _NORM_SQL.format(col=col)
    return (
        f"transform(filter(split({norm}, ' +'), w -> w != ''), "
        f"w -> trim(regexp_replace(w, '(.)', '$1 ')))"
    )


def _merge_chain(merges: list[tuple[str, str]], base: str) -> str:
    """Chained boundary-safe replaces: the symbol string is padded with
    spaces and every pattern carries its flanking spaces, so a merge can
    never match across symbol boundaries ('a s' inside 'a st').

    Each merge's replace is applied TWICE: a single left-to-right
    non-overlapping pass misses alternating occurrences that share a
    boundary space (' a b a b ' matches at 0 and 8, skipping 4), and the
    miss would also stall the learning loop on repetitive words.  Two
    passes resolve one level of alternation — exact for natural-text
    merge tables; pathological same-pair runs (aaaa…) may retain
    unmerged residue, identically in both engines."""
    s = f"concat(' ', {base}, ' ')"
    for a, b in merges:
        for _ in range(2):
            s = f"replace({s}, ' {a} {b} ', ' {a}{b} ')"
    return f"trim({s})"


def bpe_tokens_expr(col: str, merges: list[tuple[str, str]]) -> Column:
    """Array of BPE tokens for ``col`` under the frozen merge table."""
    s = _merge_chain(merges, "w")
    return F.expr(
        f"flatten(transform({_spaced_words(col)}, w -> split({s}, ' ')))"
    )


def bpe_sql(col: str, merges: list[tuple[str, str]]) -> str:
    """The identical tokenizer as DuckDB SQL text (oracle mirror)."""
    norm = f"regexp_replace(lower({col}), '[^a-z0-9 ]', ' ', 'g')"
    spaced = "trim(regexp_replace(w, '(.)', '\\1 ', 'g'))"
    s = _merge_chain(merges, spaced)
    return (
        f"flatten(list_transform("
        f"list_filter(string_split_regex({norm}, ' +'), w -> w != ''), "
        f"w -> string_split({s}, ' ')))"
    )


def learn_bpe_merges(
    df: DataFrame, text_col: str, n_merges: int = 20
) -> list[tuple[str, str]]:
    """Greedy BPE merge learning: ONE corpus scan, then vocab-sized work.

    The corpus is scanned exactly once, into a weighted word table
    (distinct word → occurrence count — the classic tokenizer-training
    reduction: pair counts over occurrences equal pair counts over
    distinct words weighted by frequency).  Every merge round then runs
    on that vocab-sized table: count adjacent symbol pairs weighted by
    word frequency, promote the max-count pair (ties lexicographic, so
    the table is deterministic), and apply THAT ONE merge to the table
    — sequential composition, so the incremental state is identical to
    re-running the full replace chain from scratch (each round of the
    previous formulation), at 1/n_merges the scan cost.  At 100 TB:
    one corpus shuffle + n_merges vocab-table aggregates; the driver
    sees one (pair, count) row per round.
    """
    # the ONE corpus pass: word → weight (vocab-sized, materialized so
    # no round re-reads the corpus)
    words = (
        df.select(F.explode(F.expr(_spaced_words(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for rnd in range(n_merges):
        pairs = (
            words.select(F.split("w", " ").alias("syms"), "n")
            .filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2), "
                        "i -> struct(syms[i] AS a, syms[i+1] AS b))"
                    )
                ).alias("p"),
                "n",
            )
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        p = top[0]["p"]
        merges.append((p["a"], p["b"]))
        # fold the ONE new merge into the standing table (same
        # boundary-safe double-pass replace as the apply chain);
        # checkpoint keeps lineage flat across rounds
        one = _merge_chain(merges[-1:], "w")
        words = words.select(
            F.expr(one).alias("w"), "n"
        ).localCheckpoint(eager=True)
    return merges
