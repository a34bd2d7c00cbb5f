"""Registry-wide physical-plan lint — the machine-enforced version of
the scale review that previously happened by hand.

The r3 verdict found three single-partition global windows by reading
plans; r4 fixed them and guarded those three queries individually
(test_plan_shapes.py:462). This sweep makes the guard UNIVERSAL so no
future registry entry can reintroduce the classic 100 TB killers:

1. ``CartesianProduct`` — an all-pairs join; corpus² rows at scale.
   (Broadcast nested-loop over a tiny broadcast side is a different
   node and is allowed where intentional: ann_bruteforce's
   query-batch × corpus scan.)
2. ``BatchEvalPython`` — a row-at-a-time Python UDF on the hot path;
   10-100× slower than Arrow/pandas batches. ``BatchEvalPythonUDTF``
   is matched separately: the one registered UDTF is the declared
   Spark-4 API-surface demo (the posexplode form is the hot path).
3. An ``Exchange SinglePartition`` whose input is NOT provably bounded
   (an Aggregate — one row per upstream partition/group — or a
   LocalLimit/TakeOrderedAndProject). A single-partition exchange over
   raw rows serializes the corpus through one task; AQE cannot split
   it.

Queries on the whitelist are documented exceptions, each with the
reason reviewed in a verdict round. Adding a query to the whitelist
requires the same justification — the test fails loudly otherwise.
"""

from __future__ import annotations

import re

import pytest

from knowledge_model_spark.plans import load_registry

from tests.conftest import SF_DIR

REGISTRY = load_registry()

# query -> (rule, reason). Reviewed exceptions only.
WHITELIST: dict[str, tuple[str, str]] = {
    "udtf_sentence_split": (
        "row_udtf",
        "the registered Spark 4 Python-UDTF API demo (SURVEY §2.10); "
        "the production path is the posexplode/pandas chunker — "
        "documented at functions/udtf.py",
    ),
    "window_ntile_percent_rank": (
        "single_partition",
        "ntile/percent_rank over an unpartitioned window is "
        "single-partition BY SQL SEMANTICS; kept as the API demo with "
        "the production decomposition documented at "
        "plans/relational_queries.py:579 (r4 verdict: acceptable)",
    ),
}

_AGGS = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
# WindowGroupLimit (the node Spark 4 inserts under a rank<=k filter)
# bounds its output to k rows PER GROUP — strictly global boundedness
# would additionally need a bounded group count, which the plan text
# cannot prove.  It is accepted as bounding because (a) per-group-limit
# shortlists feeding a global window are exactly the top-k-then-
# normalize shape (retrieval_hybrid_weighted: k=20 per retriever), and
# (b) the alternative — a per-query whitelist entry — waives EVERY
# single-partition check for that query, which is strictly weaker than
# trusting the limit node (r5 verdict item 7).
_BOUNDED = _AGGS + ("LocalLimit", "TakeOrderedAndProject", "WindowGroupLimit")
# single-child operators that preserve (never multiply) row counts, so
# boundedness looks through them.  Window is row-preserving — it adds
# COLUMNS over the same rows; the single-partition hazard of an
# unpartitioned window is the Exchange above it, which is the very node
# being linted, so skipping Window here loses nothing.
_PASSTHROUGH = (
    "Project",
    "Filter",
    "ColumnarToRow",
    "InputAdapter",
    "Coalesce",
    "AQEShuffleRead",
    "WholeStageCodegen",
    "Window [",  # not WindowGroupLimit — that is a _BOUNDED node
)


def _indent(line: str) -> int:
    for k, ch in enumerate(line):
        if ch.isalpha():
            return k
    return len(line)


def _single_partition_violations(plan: str) -> list[str]:
    """Every ``Exchange SinglePartition`` must consume a bounded
    subtree: walk its children (indentation-delimited), skipping
    row-preserving passthroughs, until a bounding operator or a
    substantive non-bounding one."""
    lines = plan.splitlines()
    out = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        base = _indent(ln)
        verdict = None
        for j in range(i + 1, len(lines)):
            nxt = lines[j]
            if _indent(nxt) <= base:
                break  # left the Exchange's subtree
            if any(b in nxt for b in _BOUNDED):
                verdict = "ok"
                break
            if any(p in nxt for p in _PASSTHROUGH):
                continue
            verdict = nxt.strip()[:90]
            break
        if verdict != "ok":
            out.append(f"line {i}: feeds from [{verdict}]")
    return out


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_lint(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    rule, _reason = WHITELIST.get(name, (None, None))

    assert "CartesianProduct" not in plan, f"{name}: all-pairs join"

    if rule != "row_udtf":
        # \b: BatchEvalPythonUDTF is a distinct node (see WHITELIST)
        assert not re.search(r"BatchEvalPython\b", plan), (
            f"{name}: row-at-a-time Python UDF on the hot path"
        )
        assert "BatchEvalPythonUDTF" not in plan, (
            f"{name}: unreviewed Python UDTF"
        )

    if rule != "single_partition":
        viol = _single_partition_violations(plan)
        assert not viol, (
            f"{name}: Exchange SinglePartition over unbounded input "
            f"(serializes the corpus through one task at scale): {viol}"
        )
